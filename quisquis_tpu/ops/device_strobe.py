"""Batched STROBE-128 / merlin transcripts on TPU.

The verifier's Fiat-Shamir replay is inherently sequential *within* one
proof but embarrassingly parallel *across* proofs of the same shape: the
framing schedule (labels, operation kinds, byte counts) is identical for
every lane, only the absorbed byte values differ. This module exploits
that: sponge positions (`pos`, `pos_begin`, flags) are tracked in ordinary
Python at trace time — they are functions of the schedule only — while the
200-byte states live as one `[..., 200]` int32 tensor on device and all
byte XOR/overwrite/squeeze ops compile to static slice updates around the
batched Keccak permutation (ops/device_keccak.py).

This is what lets an entire batch verification (transcript replay ->
challenge arithmetic -> one MSM) run inside a single jitted program with
one upload and one boolean fetch; see bulletproofs/device_verify.py.

Framing is bit-exact with ops/strobe.py (merlin v2), which is itself
pinned to the merlin crate test vector.
"""

from __future__ import annotations

import struct
from typing import Union

import numpy as np
import jax.numpy as jnp

from .strobe import Strobe128, STROBE_R, _FLAG_I, _FLAG_A, _FLAG_C, _FLAG_M
from .device_keccak import f1600

Data = Union[bytes, jnp.ndarray]  # constant bytes or per-lane [..., k] int32

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"


def _u32le(n: int) -> bytes:
    return struct.pack("<I", n)


def snapshot_host_strobe(strobe) -> tuple:
    """(state bytes, pos, pos_begin, cur_flags) from either the pure-Python
    Strobe128 or the C++ NativeStrobe128 (208-byte ctx layout,
    native/qq_native.cpp:75-80)."""
    ctx = getattr(strobe, "ctx", None)
    if ctx is not None:
        b = bytes(ctx)
        return b[:200], b[200], b[201], b[202]
    return bytes(strobe.state), strobe.pos, strobe.pos_begin, strobe.cur_flags


class DeviceStrobe:
    """Batched STROBE-128 state; schedule static, byte values per lane."""

    def __init__(self, protocol_label: bytes, batch_shape=()):
        host = Strobe128(protocol_label)
        init = np.frombuffer(bytes(host.state), np.uint8).astype(np.int32)
        self.state = jnp.asarray(init) + jnp.zeros(batch_shape + (200,),
                                                   jnp.int32)
        self.pos = host.pos
        self.pos_begin = host.pos_begin
        self.cur_flags = host.cur_flags
        self.batch_shape = batch_shape

    @classmethod
    def from_host_states(cls, states: np.ndarray, pos: int, pos_begin: int,
                         cur_flags: int) -> "DeviceStrobe":
        """Resume batched replay from per-lane host Strobe128 snapshots
        (all lanes must share pos/pos_begin/flags — true whenever the
        host-side prefix schedule was shape-identical across lanes)."""
        s = object.__new__(cls)
        arr = jnp.asarray(states).astype(jnp.int32)
        s.state = arr
        s.pos = pos
        s.pos_begin = pos_begin
        s.cur_flags = cur_flags
        s.batch_shape = arr.shape[:-1]
        return s

    # -- internals -----------------------------------------------------------

    def _run_f(self) -> None:
        # all three pad-byte positions and values are trace-time constants:
        # one constant-vector XOR instead of three scatters
        padv = np.zeros(200, np.int32)
        padv[self.pos] ^= self.pos_begin
        padv[self.pos + 1] ^= 0x04
        padv[STROBE_R + 1] ^= 0x80
        self.state = f1600(self.state ^ jnp.asarray(padv))
        self.pos = 0
        self.pos_begin = 0

    def _chunks(self, total: int):
        """Split `total` bytes at (static) rate boundaries."""
        off = 0
        while off < total:
            c = min(STROBE_R - self.pos, total - off)
            yield off, c
            off += c

    def _as_lane_array(self, data: Data) -> jnp.ndarray:
        if isinstance(data, (bytes, bytearray)):
            # constants stay 1-D: the padded XOR broadcasts over lanes
            return jnp.asarray(np.frombuffer(bytes(data), np.uint8)
                               .astype(np.int32))
        return data

    def _absorb(self, data: Data, nbytes: int) -> None:
        arr = self._as_lane_array(data)
        assert arr.shape[-1] == nbytes
        for off, c in self._chunks(nbytes):
            # zero-padded XOR at a static offset: 2 cheap ops, no scatter
            pad = [(0, 0)] * (arr.ndim - 1) + [(self.pos,
                                               200 - self.pos - c)]
            self.state = self.state ^ jnp.pad(arr[..., off:off + c], pad)
            self.pos += c
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int) -> jnp.ndarray:
        outs = []
        for _, c in self._chunks(n):
            outs.append(self.state[..., self.pos:self.pos + c])
            mask = np.ones(200, np.int32)
            mask[self.pos:self.pos + c] = 0
            self.state = self.state * jnp.asarray(mask)
            self.pos += c
            if self.pos == STROBE_R:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert flags == self.cur_flags
            return
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]), 2)
        if flags & _FLAG_C and self.pos != 0:
            self._run_f()

    # -- merlin subset ---------------------------------------------------------

    def meta_ad(self, data: Data, more: bool, nbytes: int = -1) -> None:
        self._begin_op(_FLAG_M | _FLAG_A, more)
        self._absorb(data, len(data) if nbytes < 0 else nbytes)

    def ad(self, data: Data, more: bool, nbytes: int = -1) -> None:
        self._begin_op(_FLAG_A, more)
        self._absorb(data, len(data) if nbytes < 0 else nbytes)

    def prf(self, n: int, more: bool = False) -> jnp.ndarray:
        self._begin_op(_FLAG_I | _FLAG_A | _FLAG_C, more)
        return self._squeeze(n)

    def _overwrite(self, data: Data, nbytes: int) -> None:
        arr = self._as_lane_array(data)
        assert arr.shape[-1] == nbytes
        for off, c in self._chunks(nbytes):
            mask = np.ones(200, np.int32)
            mask[self.pos:self.pos + c] = 0
            pad = [(0, 0)] * (arr.ndim - 1) + [(self.pos,
                                               200 - self.pos - c)]
            self.state = (self.state * jnp.asarray(mask)
                          ^ jnp.pad(arr[..., off:off + c], pad))
            self.pos += c
            if self.pos == STROBE_R:
                self._run_f()

    def key(self, data: Data, more: bool, nbytes: int = -1) -> None:
        self._begin_op(_FLAG_A | _FLAG_C, more)
        self._overwrite(data, len(data) if nbytes < 0 else nbytes)

    def clone(self) -> "DeviceStrobe":
        c = object.__new__(DeviceStrobe)
        c.state = self.state          # jnp arrays are immutable
        c.pos = self.pos
        c.pos_begin = self.pos_begin
        c.cur_flags = self.cur_flags
        c.batch_shape = self.batch_shape
        return c


class DeviceTranscript:
    """Batched merlin::Transcript twin of accounts.transcript.Transcript."""

    def __init__(self, label: bytes, batch_shape=()):
        self.strobe = DeviceStrobe(MERLIN_PROTOCOL_LABEL, batch_shape)
        self.append_message(b"dom-sep", label)

    @classmethod
    def from_host_transcripts(cls, transcripts) -> "DeviceTranscript":
        """Batch host Transcript objects (shape-identical histories) into a
        device transcript — the bridge that lets a host-replayed *prefix*
        (e.g. the transaction transcript before its range proofs) continue
        on device."""
        snaps = [snapshot_host_strobe(t.strobe) for t in transcripts]
        _, pos, pb, fl = snaps[0]
        assert all(s[1:] == (pos, pb, fl) for s in snaps), \
            "lane transcripts diverged in framing"
        states = np.stack([np.frombuffer(s[0], np.uint8)
                           for s in snaps]).astype(np.int32)
        t = object.__new__(cls)
        t.strobe = DeviceStrobe.from_host_states(states, pos, pb, fl)
        return t

    def append_message(self, label: bytes, message: Data,
                       nbytes: int = -1) -> None:
        n = len(message) if nbytes < 0 else nbytes
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le(n), True)
        self.strobe.ad(message, False, n)

    def append_u64(self, label: bytes, x: int) -> None:
        self.append_message(label, struct.pack("<Q", x))

    def challenge_bytes(self, label: bytes, n: int) -> jnp.ndarray:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le(n), True)
        return self.strobe.prf(n, False)

    def domain_sep(self, label: bytes) -> None:
        self.append_message(b"dom-sep", label)

    def append_scalar_var(self, label: bytes, scalar_bytes: Data) -> None:
        self.append_message(label, scalar_bytes, 32)

    def append_point_var(self, label: bytes, point_bytes: Data) -> None:
        self.append_message(b"ptvar", label)
        self.append_message(b"val", point_bytes, 32)

    def get_challenge_bytes(self, label: bytes) -> jnp.ndarray:
        """64 challenge bytes [..., 64]; reduce with scalar_field.from_bytes_wide."""
        return self.challenge_bytes(label, 64)


class DeviceTranscriptRng:
    """Batched merlin TranscriptRng twin (witness-rekeyed PRF stream).

    Mirrors accounts.transcript.TranscriptRngBuilder/TranscriptRng on the
    device: clone the transcript's STROBE state, rekey with per-lane
    witness bytes, finalize with per-lane entropy, then draw PRF bytes.
    Bit-exact with the host implementation (the device shuffle prover's
    blinding draws must match the host prover's byte-for-byte)."""

    def __init__(self, strobe: DeviceStrobe):
        self.strobe = strobe.clone()

    def rekey_with_witness_bytes(self, label: bytes, witness: Data,
                                 nbytes: int = -1) -> "DeviceTranscriptRng":
        n = len(witness) if nbytes < 0 else nbytes
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le(n), True)
        self.strobe.key(witness, False, n)
        return self

    def finalize(self, entropy: Data) -> "DeviceTranscriptRng":
        self.strobe.meta_ad(b"rng", False)
        self.strobe.key(entropy, False, 32)
        return self

    def fill_bytes(self, n: int) -> jnp.ndarray:
        self.strobe.meta_ad(_u32le(n), False)
        return self.strobe.prf(n, False)

    def random_scalar_bytes(self) -> jnp.ndarray:
        """64 PRF bytes [..., 64]; reduce with scalar_field.from_bytes_wide
        (Scalar::random equivalent)."""
        return self.fill_bytes(64)
