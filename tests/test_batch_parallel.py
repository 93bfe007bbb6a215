"""Device batch kernels + sharded execution tests (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.ops import point as pt
from quisquis_tpu.ops import batch as qb
from quisquis_tpu.ops import msm as qmsm
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.primitives.elgamal import ElGamalCommitment
from quisquis_tpu.accounts.transcript import SeededRng
from quisquis_tpu.parallel.mesh import make_mesh, shard_batch, shard_points
from quisquis_tpu.parallel.sharded_msm import sharded_msm, sharded_commitment_verify

B = 8


def setup():
    r = SeededRng(seed=b"batch")
    sks, pks, rs, vs = [], [], [], []
    for _ in range(B):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        sks.append(sk)
        pks.append(pk)
        rs.append(r.random_scalar())
        vs.append(r.random_scalar() % (1 << 32))
    return r, sks, pks, rs, vs


def test_batch_commitment_generation_matches_host():
    r, sks, pks, rs, vs = setup()
    dev_pk = qb.pks_to_device(pks)
    comm = qb.generate_commitments(dev_pk, qb.scalars_to_device(rs),
                                   qb.scalars_to_device(vs))
    host = [ElGamalCommitment.generate_commitment(pk, rr, v)
            for pk, rr, v in zip(pks, rs, vs)]
    got_c = pt.compress_to_bytes(comm.c)
    got_d = pt.compress_to_bytes(comm.d)
    for i in range(B):
        assert bytes(got_c[i]) == host[i].c
        assert bytes(got_d[i]) == host[i].d
    # batched verify
    ok = qb.verify_commitments(comm, qb.scalars_to_device([s.scalar for s in sks]),
                               qb.scalars_to_device(vs))
    assert bool(jnp.all(ok))
    # wrong value fails
    bad = qb.verify_commitments(comm, qb.scalars_to_device([s.scalar for s in sks]),
                                qb.scalars_to_device([v + 1 for v in vs]))
    assert not bool(jnp.any(bad))


def test_batch_account_update_matches_host():
    from quisquis_tpu.accounts.accounts import Account
    r, sks, pks, rs, vs = setup()
    accounts = []
    for pk, rr in zip(pks, rs):
        accounts.append(Account.set_account(
            pk, ElGamalCommitment.generate_commitment(pk, rr, 0)))
    bl = [7] * B
    uks = [r.random_scalar() for _ in range(B)]
    cs = [r.random_scalar() for _ in range(B)]
    host_updated = [Account.update_account(a, b, u, c)
                    for a, b, u, c in zip(accounts, bl, uks, cs)]
    dev_pk = qb.pks_to_device(pks)
    dev_comm = qb.comms_to_device([a.comm for a in accounts])
    new_pk, new_comm = qb.update_accounts(
        dev_pk, dev_comm, qb.scalars_to_device(bl), qb.scalars_to_device(uks),
        qb.scalars_to_device(cs))
    for i in range(B):
        assert bytes(pt.compress_to_bytes(new_pk.gr)[i]) == host_updated[i].pk.gr
        assert bytes(pt.compress_to_bytes(new_pk.grsk)[i]) == host_updated[i].pk.grsk
        assert bytes(pt.compress_to_bytes(new_comm.c)[i]) == host_updated[i].comm.c
        assert bytes(pt.compress_to_bytes(new_comm.d)[i]) == host_updated[i].comm.d


def test_device_msm_matches_host():
    r, sks, pks, rs, vs = setup()
    points = [pk.gr_point for pk in pks]
    expected = ex.pt_msm(rs, points)
    got = qmsm.msm_host(rs, points)
    assert ex.pt_eq(got, expected)


def test_sharded_msm_matches_single_device():
    r, sks, pks, rs, vs = setup()
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    points = pt.from_exact_batch([pk.gr_point for pk in pks])
    nibbles = jnp.asarray(pt.scalars_to_nibbles(rs))
    total = sharded_msm(mesh, shard_batch(mesh, nibbles),
                        shard_points(mesh, points))
    single = pt.ExtPoint(total.x[None], total.y[None], total.z[None],
                         total.t[None])
    got = pt.to_exact_batch(single)[0]
    assert ex.pt_eq(got, ex.pt_msm(rs, [pk.gr_point for pk in pks]))


def test_sharded_commitment_verify():
    r, sks, pks, rs, vs = setup()
    mesh = make_mesh(8)
    dev_pk = qb.pks_to_device(pks)
    comm = qb.generate_commitments(dev_pk, qb.scalars_to_device(rs),
                                   qb.scalars_to_device(vs))
    sk_n = qb.scalars_to_device([s.scalar for s in sks])
    v_n = qb.scalars_to_device(vs)
    sharded_comm = qb.BatchCommitment(
        shard_points(mesh, comm.c), shard_points(mesh, comm.d))
    assert sharded_commitment_verify(mesh, sharded_comm,
                                     shard_batch(mesh, sk_n),
                                     shard_batch(mesh, v_n))


def test_msm_pippenger_matches_ladder_and_host():
    r = SeededRng(seed=b"pip")
    n = 48  # non-power-of-two exercises the padded tree reduction
    ss = [r.random_scalar() for _ in range(n)]
    host_pts = [ex.pt_base_mul(r.random_scalar()) for _ in range(n)]
    expected = ex.pt_msm(ss, host_pts)
    nib = jnp.asarray(pt.scalars_to_nibbles(ss))
    dev = pt.from_exact_batch(host_pts)
    for fn in (qmsm.msm_pippenger_raw, qmsm.msm_ladder_raw):
        out = jax.jit(fn)(nib, dev)
        single = pt.ExtPoint(out.x[None], out.y[None], out.z[None], out.t[None])
        assert ex.pt_eq(pt.to_exact_batch(single)[0], expected)


def test_sharded_msm_deterministic_under_permutation():
    """Bit-exactness under sharding (SURVEY §5 'deterministic reduction
    order'): the sharded MSM must produce byte-identical output for every
    mesh size AND for any permutation of the point axis across shards —
    the multi-host hazard is a reduction order that depends on data
    placement."""
    r = SeededRng(seed=b"perm")
    n = 32
    scalars = [r.random_scalar() for _ in range(n)]
    points = [ex.pt_base_mul(r.random_scalar()) for _ in range(n)]
    nib = jnp.asarray(pt.scalars_to_nibbles(scalars))
    ext = pt.from_exact_batch(points)

    def run(mesh_size, perm):
        mesh = make_mesh(mesh_size)
        nib_p = nib[perm]
        ext_p = pt.ExtPoint(*(c[perm] for c in ext))
        out = sharded_msm(mesh, shard_batch(mesh, nib_p),
                          shard_points(mesh, ext_p))
        single = pt.ExtPoint(out.x[None], out.y[None], out.z[None],
                             out.t[None])
        return bytes(pt.compress_to_bytes(single)[0])

    rng = np.random.default_rng(3)
    baseline = run(1, np.arange(n))
    assert baseline == ex.ristretto_encode(ex.pt_msm(scalars, points))
    for mesh_size in (1, 2, 4, 8):
        for trial in range(2):
            perm = rng.permutation(n)
            got = run(mesh_size, perm)
            # ENCODED result identical regardless of placement; the raw
            # extended coordinates may differ (different Z), the wire
            # bytes may not
            assert got == baseline, (mesh_size, trial)


def test_batch_verify_deterministic_across_mesh_shapes():
    """The deferred-checks sharded backend yields the same accept/reject
    decision and identical combined-MSM encodings across mesh shapes."""
    from quisquis_tpu.accounts.deferred import DeferredPointChecks

    r = SeededRng(seed=b"perm2")
    base = [ex.pt_base_mul(r.random_scalar()) for _ in range(20)]
    for mesh_size in (2, 8):
        d = DeferredPointChecks(seed=b"s" * 32)
        for i, p in enumerate(base):
            # k*P == Q with Q precomputed: two distinct points per check
            k = r.random_scalar()
            d.check_eq([k], [p], ex.pt_mul(k, p), f"chk{i}")
        d.verify(backend="sharded", mesh=make_mesh(mesh_size))


def test_sharded_device_range_verifier_mesh():
    """Config-4 flagship on the virtual mesh: the one-program range
    verifier with lanes sharded over 8 devices — accept, per-shard tamper
    rejection (first and last device), and acceptance under lane
    permutation."""
    from quisquis_tpu.accounts.transcript import Transcript, SeededRng
    from quisquis_tpu.bulletproofs.range_proof import RangeProof
    from quisquis_tpu.bulletproofs.device_verify import DeviceRangeVerifier
    from quisquis_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = SeededRng(seed=b"shard-drv")
    proofs, vlists = [], []
    for i in range(8):
        p, V = RangeProof.prove_multiple(
            Transcript(b"RangeProof"), [i + 3], [rng.random_scalar()], 8,
            rng=rng)
        proofs.append(p)
        vlists.append(V)
    drv = DeviceRangeVerifier(8, 1, 8)
    drv.verify_sharded(proofs, vlists, mesh, rng=SeededRng(seed=b"w"))

    # lane permutation: same proofs, any order, still accepts
    perm = [5, 2, 7, 0, 3, 6, 1, 4]
    drv.verify_sharded([proofs[i] for i in perm], [vlists[i] for i in perm],
                       mesh, rng=SeededRng(seed=b"w2"))

    # tamper on the first and the last shard
    import pytest
    for lane in (0, 7):
        blob = bytearray(proofs[lane].to_bytes())
        blob[130] ^= 1
        bad = list(proofs)
        bad[lane] = RangeProof.from_bytes(bytes(blob))
        with pytest.raises(ValueError):
            drv.verify_sharded(bad, vlists, mesh, rng=SeededRng(seed=b"w3"))
