"""ctypes bindings for the native C++ curve library (native/qq_curve.cpp).

Accelerates the host exact backend (51-bit-limb field, extended points,
windowed scalar-mul, Pippenger MSM, ristretto encode/decode) by ~50-100x
over pure Python. The exact backend transparently dispatches here when the
library is built; the pure-Python implementations remain as fallback and as
the cross-check oracle (tests compare both paths bit-for-bit).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

from ._libpath import find_native_lib

_LIB_PATH = find_native_lib()

_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _LIB_PATH is None:
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.qq_curve_init.argtypes = [ctypes.c_char_p] * 7
        lib.qq_pt_add.argtypes = [ctypes.c_char_p] * 3
        lib.qq_pt_double.argtypes = [ctypes.c_char_p] * 2
        lib.qq_pt_scalar_mul.argtypes = [ctypes.c_char_p] * 3
        lib.qq_pt_msm.argtypes = [ctypes.c_uint64] + [ctypes.c_char_p] * 3
        lib.qq_ristretto_encode.argtypes = [ctypes.c_char_p] * 2
        lib.qq_ristretto_decode.argtypes = [ctypes.c_char_p] * 2
        lib.qq_ristretto_decode.restype = ctypes.c_int
        lib.qq_initialized.restype = ctypes.c_int
        lib.qq_set_basepoint.argtypes = [ctypes.c_char_p]
        lib.qq_pt_base_mul.argtypes = [ctypes.c_char_p] * 2
        lib.qq_base_ready.restype = ctypes.c_int
        lib.qq_pt_mul_batch.argtypes = [ctypes.c_uint64] + [ctypes.c_char_p] * 3
        lib.qq_fold_batch.argtypes = [ctypes.c_uint64] + [ctypes.c_char_p] * 5
        lib.qq_pt_msm_many.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
        lib.qq_ristretto_encode_batch.argtypes = [
            ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p]
        lib.qq_ristretto_decode_batch.argtypes = [
            ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p]
        lib.qq_ristretto_decode_batch.restype = ctypes.c_longlong
    except (OSError, AttributeError):
        return None
    _lib = lib
    return lib


def init_constants(ex) -> bool:
    """Inject field constants from the exact backend; returns availability."""
    lib = _load()
    if lib is None:
        return False
    if lib.qq_initialized():
        return True
    P = ex.P

    def fb(v):
        return (v % P).to_bytes(32, "little")

    lib.qq_curve_init(fb(ex.D), fb(ex.D2), fb(ex.SQRT_M1),
                      fb(ex.INVSQRT_A_MINUS_D), fb(ex.SQRT_AD_MINUS_ONE),
                      fb(ex.ONE_MINUS_D_SQ), fb(ex.D_MINUS_ONE_SQ))
    lib.qq_set_basepoint(_pt_to_bytes(ex.BASEPOINT))
    return True


# point wire form: 4 x 32B LE (x, y, z, t)

class _WirePoint(tuple):
    """Point tuple that remembers its native 128-byte wire form.

    Behaves exactly like the plain 4-tuple `ex.Point`; the cached `wire`
    attribute lets points that flow native->native (decode -> MSM, add ->
    MSM, ...) skip the int<->bytes marshal, which dominates wall-clock on
    slow hosts for large batched verifications. (tuple subtypes cannot
    declare nonempty __slots__, so instances carry a small __dict__.)"""


def _pt_to_bytes(p: tuple) -> bytes:
    w = getattr(p, "wire", None)
    if w is not None:
        return w
    x, y, z, t = p
    return (x.to_bytes(32, "little") + y.to_bytes(32, "little") +
            z.to_bytes(32, "little") + t.to_bytes(32, "little"))


def _pt_from_bytes(b: bytes) -> tuple:
    p = _WirePoint((int.from_bytes(b[0:32], "little"),
                    int.from_bytes(b[32:64], "little"),
                    int.from_bytes(b[64:96], "little"),
                    int.from_bytes(b[96:128], "little")))
    p.wire = bytes(b)
    return p


def pt_add(p: tuple, q: tuple) -> tuple:
    out = ctypes.create_string_buffer(128)
    _lib.qq_pt_add(_pt_to_bytes(p), _pt_to_bytes(q), out)
    return _pt_from_bytes(out.raw)


def pt_double(p: tuple) -> tuple:
    out = ctypes.create_string_buffer(128)
    _lib.qq_pt_double(_pt_to_bytes(p), out)
    return _pt_from_bytes(out.raw)


def pt_mul(s: int, p: tuple, order: int) -> tuple:
    out = ctypes.create_string_buffer(128)
    _lib.qq_pt_scalar_mul((s % order).to_bytes(32, "little"),
                          _pt_to_bytes(p), out)
    return _pt_from_bytes(out.raw)


def pt_msm(scalars, points, order: int) -> tuple:
    n = len(scalars)
    sbuf = b"".join((s % order).to_bytes(32, "little") for s in scalars)
    pbuf = b"".join(_pt_to_bytes(p) for p in points)
    out = ctypes.create_string_buffer(128)
    _lib.qq_pt_msm(n, sbuf, pbuf, out)
    return _pt_from_bytes(out.raw)


def pt_mul_batch(scalars, points, order: int) -> List[tuple]:
    """out[i] = s_i * P_i — one marshal for the whole batch."""
    n = len(scalars)
    sbuf = b"".join((s % order).to_bytes(32, "little") for s in scalars)
    pbuf = b"".join(_pt_to_bytes(p) for p in points)
    out = ctypes.create_string_buffer(128 * n)
    _lib.qq_pt_mul_batch(n, sbuf, pbuf, out)
    raw = out.raw
    return [_pt_from_bytes(raw[128 * i:128 * (i + 1)]) for i in range(n)]


def fold_batch(a_scalars, b_scalars, ps, qs, order: int) -> List[tuple]:
    """out[i] = a_i*P_i + b_i*Q_i (Strauss shared-doubling per element)."""
    n = len(ps)
    abuf = b"".join((a % order).to_bytes(32, "little") for a in a_scalars)
    bbuf = b"".join((b % order).to_bytes(32, "little") for b in b_scalars)
    pbuf = b"".join(_pt_to_bytes(p) for p in ps)
    qbuf = b"".join(_pt_to_bytes(q) for q in qs)
    out = ctypes.create_string_buffer(128 * n)
    _lib.qq_fold_batch(n, abuf, bbuf, pbuf, qbuf, out)
    raw = out.raw
    return [_pt_from_bytes(raw[128 * i:128 * (i + 1)]) for i in range(n)]


def pt_msm_many(items, order: int) -> List[tuple]:
    """Independent MSMs threaded across rows: items = [(scalars, points), ...]."""
    rows = len(items)
    ns = (ctypes.c_uint64 * rows)(*[len(s) for s, _ in items])
    sbuf = b"".join((s % order).to_bytes(32, "little")
                    for ss, _ in items for s in ss)
    pbuf = b"".join(_pt_to_bytes(p) for _, pp in items for p in pp)
    out = ctypes.create_string_buffer(128 * rows)
    _lib.qq_pt_msm_many(rows, ns, sbuf, pbuf, out)
    raw = out.raw
    return [_pt_from_bytes(raw[128 * i:128 * (i + 1)]) for i in range(rows)]


def pt_base_mul(s: int, order: int) -> tuple:
    out = ctypes.create_string_buffer(128)
    _lib.qq_pt_base_mul((s % order).to_bytes(32, "little"), out)
    return _pt_from_bytes(out.raw)


def ristretto_encode(p: tuple) -> bytes:
    out = ctypes.create_string_buffer(32)
    _lib.qq_ristretto_encode(_pt_to_bytes(p), out)
    return out.raw[:32]


def ristretto_decode(b: bytes) -> Optional[tuple]:
    if len(b) != 32:
        return None
    out = ctypes.create_string_buffer(128)
    ok = _lib.qq_ristretto_decode(bytes(b), out)
    return _pt_from_bytes(out.raw) if ok else None


def ristretto_encode_batch(points) -> List[bytes]:
    n = len(points)
    pbuf = b"".join(_pt_to_bytes(p) for p in points)
    out = ctypes.create_string_buffer(32 * n)
    _lib.qq_ristretto_encode_batch(n, pbuf, out)
    raw = out.raw
    return [raw[32 * i:32 * (i + 1)] for i in range(n)]


def ristretto_decode_batch(blobs) -> Optional[List[tuple]]:
    """Decode many 32-byte encodings; None if ANY is invalid."""
    n = len(blobs)
    for b in blobs:
        if len(b) != 32:
            return None
    out = ctypes.create_string_buffer(128 * n)
    bad = _lib.qq_ristretto_decode_batch(n, b"".join(bytes(b) for b in blobs),
                                         out)
    if bad >= 0:
        return None
    raw = out.raw
    return [_pt_from_bytes(raw[128 * i:128 * (i + 1)]) for i in range(n)]
