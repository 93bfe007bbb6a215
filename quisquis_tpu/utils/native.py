"""ctypes bindings for the native C++ runtime library (native/qq_native.cpp).

Loads `native/libqq_native.so` if present (build with `make -C native`);
every function has a pure-Python fallback, so the native library is a
performance fast path, not a requirement. The Keccak permutation is the
transcript layer's inner loop — the native version is ~100x the Python one,
which matters for proof pipelines doing hundreds of transcript ops.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

from ._libpath import find_native_lib

_LIB_PATH = find_native_lib()

_lib: Optional[ctypes.CDLL] = None
if _LIB_PATH is not None:
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.keccak_f1600.argtypes = [ctypes.c_char_p]
        _lib.strobe_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_uint64]
        _lib.strobe_meta_ad.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_uint64, ctypes.c_int]
        _lib.strobe_ad.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_uint64, ctypes.c_int]
        _lib.strobe_prf.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_uint64, ctypes.c_int]
        _lib.strobe_key.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_uint64, ctypes.c_int]
        try:
            _lib.strobe_rekey_witnesses.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64,
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
            _lib.strobe_append_messages.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64]
        except AttributeError:  # older library build
            pass
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def keccak_f1600_native(state: bytearray) -> None:
    """In-place Keccak-f[1600] on a 200-byte state via the native library."""
    assert len(state) == 200
    buf = (ctypes.c_char * 200).from_buffer(state)
    _lib.keccak_f1600(buf)


class NativeStrobe128:
    """STROBE-128 context backed by the C++ implementation.

    Drop-in replacement for quisquis_tpu.ops.strobe.Strobe128.
    """

    __slots__ = ("ctx",)

    def __init__(self, protocol_label: bytes, _raw: bool = False):
        self.ctx = bytearray(208)
        if not _raw:
            buf = (ctypes.c_char * 208).from_buffer(self.ctx)
            _lib.strobe_init(buf, protocol_label, len(protocol_label))

    def clone(self) -> "NativeStrobe128":
        c = NativeStrobe128(b"", _raw=True)
        c.ctx = bytearray(self.ctx)
        return c

    def _buf(self):
        return (ctypes.c_char * 208).from_buffer(self.ctx)

    def meta_ad(self, data: bytes, more: bool) -> None:
        _lib.strobe_meta_ad(self._buf(), bytes(data), len(data), int(more))

    def ad(self, data: bytes, more: bool) -> None:
        _lib.strobe_ad(self._buf(), bytes(data), len(data), int(more))

    def prf(self, n: int, more: bool) -> bytes:
        out = ctypes.create_string_buffer(n)
        _lib.strobe_prf(self._buf(), out, n, int(more))
        return out.raw[:n]

    def key(self, data: bytes, more: bool) -> None:
        _lib.strobe_key(self._buf(), bytes(data), len(data), int(more))

    def append_messages(self, items) -> None:
        """Batch of merlin append_message (label, message) pairs in one
        native call."""
        if hasattr(_lib, "strobe_append_messages"):
            import struct as _struct
            buf = b"".join(
                _struct.pack("<I", len(l)) + l + _struct.pack("<I", len(m)) + m
                for l, m in items)
            _lib.strobe_append_messages(self._buf(), buf, len(items))
        else:  # pragma: no cover - older library build
            import struct as _struct
            for l, m in items:
                self.meta_ad(l, False)
                self.meta_ad(_struct.pack("<I", len(m)), True)
                self.ad(m, False)

    def rekey_witnesses(self, label: bytes, witnesses: bytes, wlen: int,
                        count: int) -> None:
        """Batched rekey_with_witness_bytes over `count` fixed-size
        witnesses (one native call instead of 3*count)."""
        if hasattr(_lib, "strobe_rekey_witnesses"):
            _lib.strobe_rekey_witnesses(self._buf(), bytes(label), len(label),
                                        bytes(witnesses), wlen, count)
        else:  # pragma: no cover - older library build
            import struct as _struct
            for i in range(count):
                self.meta_ad(label, False)
                self.meta_ad(_struct.pack("<I", wlen), True)
                self.key(witnesses[i * wlen:(i + 1) * wlen], False)
