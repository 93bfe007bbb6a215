"""Batched device Keccak/STROBE/merlin vs the host implementations."""

import numpy as np
import jax.numpy as jnp

from quisquis_tpu.ops.keccak import keccak_f1600
from quisquis_tpu.ops.device_keccak import f1600
from quisquis_tpu.ops.strobe import Strobe128
from quisquis_tpu.ops.device_strobe import DeviceStrobe, DeviceTranscript
from quisquis_tpu.accounts.transcript import Transcript
from quisquis_tpu.ops import exact as ex

rng = np.random.default_rng(11)


def test_f1600_matches_host():
    states = rng.integers(0, 256, (5, 200), dtype=np.uint8)
    got = np.asarray(f1600(jnp.asarray(states.astype(np.int32))))
    for i in range(5):
        st = bytearray(states[i].tobytes())
        keccak_f1600(st)
        assert bytes(got[i].astype(np.uint8)) == bytes(st), f"lane {i}"


def test_strobe_matches_host():
    B = 3
    dev = DeviceStrobe(b"test proto", (B,))
    host = [Strobe128(b"test proto") for _ in range(B)]

    # constant metadata + per-lane data crossing the rate boundary
    dev.meta_ad(b"label-1", False)
    for h in host:
        h.meta_ad(b"label-1", False)
    blobs = [rng.bytes(300) for _ in range(B)]
    arr = jnp.asarray(np.stack([np.frombuffer(b, np.uint8) for b in blobs])
                      .astype(np.int32))
    dev.ad(arr, False, 300)
    for h, b in zip(host, blobs):
        h.ad(b, False)
    dev.ad(b"more", True)
    for h in host:
        h.ad(b"more", True)

    got = np.asarray(dev.prf(64))
    want = [h.prf(64, False) for h in host]
    for i in range(B):
        assert bytes(got[i].astype(np.uint8)) == want[i], f"lane {i}"

    # states keep matching afterwards
    dev.ad(b"tail", False)
    for h in host:
        h.ad(b"tail", False)
    got2 = np.asarray(dev.prf(200))  # crosses the rate boundary squeezing
    want2 = [h.prf(200, False) for h in host]
    for i in range(B):
        assert bytes(got2[i].astype(np.uint8)) == want2[i]


def test_device_transcript_challenges():
    B = 4
    dt = DeviceTranscript(b"RangeProof", (B,))
    hosts = [Transcript(b"RangeProof") for _ in range(B)]

    dt.append_message(b"dom-sep", b"rangeproof v1")
    dt.append_u64(b"n", 64)
    points = [rng.bytes(32) for _ in range(B)]
    arr = jnp.asarray(np.stack([np.frombuffer(p, np.uint8) for p in points])
                      .astype(np.int32))
    dt.append_message(b"V", arr, 32)
    for h, p in zip(hosts, points):
        h.append_message(b"dom-sep", b"rangeproof v1")
        h.append_u64(b"n", 64)
        h.append_message(b"V", p)

    from quisquis_tpu.ops import scalar_field as sf
    ch = dt.get_challenge_bytes(b"y")
    got = sf.dev_to_scalars(sf.from_bytes_wide(ch))
    want = [h.get_challenge(b"y") for h in hosts]
    assert got == want

    # scalar append framing: device takes canonical bytes, host re-encodes
    dt2 = DeviceTranscript(b"T2", (B,))
    hosts2 = [Transcript(b"T2") for _ in range(B)]
    canon = [ex.sc_to_bytes(ex.sc_from_bytes_mod_order(p)) for p in points]
    arr2 = jnp.asarray(np.stack([np.frombuffer(p, np.uint8) for p in canon])
                       .astype(np.int32))
    dt2.append_scalar_var(b"t_x", arr2)
    for h, p in zip(hosts2, canon):
        h.append_message(b"t_x", p)
    got2 = sf.dev_to_scalars(sf.from_bytes_wide(dt2.get_challenge_bytes(b"x")))
    want2 = [h.get_challenge(b"x") for h in hosts2]
    assert got2 == want2


def test_from_host_transcripts_bridge():
    B = 3
    hosts = [Transcript(b"QuisQuisProof") for _ in range(B)]
    for i, h in enumerate(hosts):
        h.append_message(b"prefix", bytes([i]) * 40)  # same-shape histories
    dt = DeviceTranscript.from_host_transcripts(hosts)
    dt.append_message(b"dom-sep", b"rangeproof v1")
    from quisquis_tpu.ops import scalar_field as sf
    got = sf.dev_to_scalars(sf.from_bytes_wide(dt.get_challenge_bytes(b"c")))
    want = []
    for h in hosts:
        h.append_message(b"dom-sep", b"rangeproof v1")
        want.append(h.get_challenge(b"c"))
    assert got == want
