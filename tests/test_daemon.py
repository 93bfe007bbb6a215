"""Resident device daemon protocol tests (quisquis_tpu.daemon).

The daemon process owns the accelerator and stays warm; clients are
fresh processes whose FIRST request runs at the daemon's steady-state
latency (the round-5 answer to the per-process compile/load toll — see
daemon.py's module docstring and tools/cache_probe.py for the measured
rationale). Here the daemon runs on CPU with host-path workloads so the
protocol, error surface, and lifecycle are exercised cheaply; the
wall-clock claim is asserted on real hardware by
tools/cache_probe.py --daemon.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOCK = f"/tmp/qq-test-daemon-{os.getpid()}.sock"


@pytest.fixture(scope="module")
def daemon():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "quisquis_tpu.daemon", "--socket", SOCK,
         "--platform", "cpu"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        from quisquis_tpu.daemon import DeviceClient

        with DeviceClient(SOCK, retries=150) as c:   # waits for readiness
            assert c.ping() == "cpu"
        yield SOCK
    finally:
        try:
            from quisquis_tpu.daemon import DeviceClient

            DeviceClient(SOCK, retries=5).shutdown()
        except Exception:
            pass
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def _shuffle_blobs(count=2):
    from quisquis_tpu.accounts.accounts import Account
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.accounts.transcript import Transcript, SeededRng
    from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                              RistrettoSecretKey)
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.utils import serde

    r = SeededRng(seed=b"daemon-sh")
    accounts = []
    for _ in range(9):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(acc)
    blobs = []
    for _ in range(count):
        sh = Shuffle.input_shuffle(accounts, rng=r)
        prover = Prover(b"Shuffle", Transcript(b"ShuffleProof"), rng=r)
        proof, statement = ShuffleProof.create_shuffle_proof(prover, sh,
                                                             rng=r)
        blobs.append(serde.shuffle_entry_to_bytes(
            proof, statement, sh.get_inputs_vector(),
            sh.get_outputs_vector()))
    return blobs


def test_daemon_shuffle_verify(daemon):
    from quisquis_tpu.daemon import DeviceClient

    blobs = _shuffle_blobs(2)
    with DeviceClient(daemon) as c:
        assert c.verify_shuffles(blobs, seed=b"w") == 2


def test_daemon_rejects_tampered_shuffle(daemon):
    from quisquis_tpu.daemon import DeviceClient

    blobs = _shuffle_blobs(1)
    bad = bytearray(blobs[0])
    bad[-1] ^= 1
    with DeviceClient(daemon) as c:
        with pytest.raises((ValueError, RuntimeError)):
            c.verify_shuffles([bytes(bad)], seed=b"w")
        # the daemon keeps serving after a failed request
        assert c.ping() == "cpu"


def test_daemon_range_prove_matches_host(daemon):
    from quisquis_tpu.accounts.transcript import Transcript, SeededRng
    from quisquis_tpu.bulletproofs.range_proof import RangeProof
    from quisquis_tpu.daemon import DeviceClient

    values = [[5], [200]]
    blinds = [[123], [456]]
    seeds = [b"dlane0", b"dlane1"]
    with DeviceClient(daemon) as c:
        out = c.prove_ranges(8, values, blinds, seeds)
    for i in range(2):
        host_proof, host_V = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), values[i], blinds[i], 8,
            rng=SeededRng(seed=seeds[i]))
        assert out[i][0] == host_proof.to_bytes()
        assert out[i][1] == host_V


def test_daemon_client_process_stays_light(daemon):
    """The client path must not load the jax-backed compute modules: a
    fresh client process pays zero compilation/tracing machinery beyond
    the socket connect. (This rig's sitecustomize imports jax into every
    interpreter, so the assertion is on quisquis_tpu's device modules.)"""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from quisquis_tpu.daemon import DeviceClient\n"
        "c = DeviceClient(%r)\n"
        "assert c.ping() == 'cpu'\n"
        "heavy = [m for m in sys.modules if m.startswith('quisquis_tpu.ops.')\n"
        "         and m.split('.')[-1] not in ('exact', 'keccak', 'strobe')]\n"
        "assert not heavy, 'client loaded device modules: %%s' %% heavy\n"
        "print('CLIENT-OK')\n" % (REPO, daemon))
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=120)
    assert "CLIENT-OK" in out.stdout, out.stdout + out.stderr
