"""C++ fe51 curve backend bit-exactness vs the pure-Python backend."""

import random

import pytest

from quisquis_tpu.ops import exact as ex


pytestmark = pytest.mark.skipif(not ex.NATIVE_CURVE,
                                reason="native curve library not built")
rng = random.Random(99)


def test_native_pt_ops_match_python():
    for _ in range(25):
        s1, s2 = rng.randrange(ex.L), rng.randrange(ex.L)
        p = ex.pt_mul_py(s1, ex.BASEPOINT)
        q = ex.pt_mul(s1, ex.BASEPOINT)
        assert ex.ristretto_encode_py(p) == ex.ristretto_encode(q)
        a = ex.pt_add_py(p, ex.pt_mul_py(s2, ex.BASEPOINT))
        b = ex.pt_add(q, ex.pt_mul(s2, ex.BASEPOINT))
        assert ex.ristretto_encode_py(a) == ex.ristretto_encode(b)
        assert ex.ristretto_encode_py(ex.pt_double_py(p)) == \
            ex.ristretto_encode(ex.pt_double(q))


def test_native_edge_scalars():
    for s in (0, 1, 2, ex.L - 1, ex.L - 2, 2**252, 8):
        assert ex.ristretto_encode(ex.pt_mul(s, ex.BASEPOINT)) == \
            ex.ristretto_encode_py(ex.pt_mul_py(s, ex.BASEPOINT))


def test_native_msm_matches_python():
    for n in (1, 2, 15, 16, 33, 200):
        ss = [rng.randrange(ex.L) for _ in range(n)]
        ps = [ex.pt_mul(s + 1, ex.BASEPOINT) for s in ss]
        assert ex.ristretto_encode(ex.pt_msm(ss, ps)) == \
            ex.ristretto_encode_py(ex.pt_msm_py(ss, ps))
    # zero scalars included
    ss = [0, 5, 0, 7]
    ps = [ex.pt_mul(k + 1, ex.BASEPOINT) for k in range(4)]
    assert ex.ristretto_encode(ex.pt_msm(ss, ps)) == \
        ex.ristretto_encode_py(ex.pt_msm_py(ss, ps))


def test_native_decode_matches_python():
    for k in (1, 7, 123456):
        enc = ex.ristretto_encode(ex.pt_mul(k, ex.BASEPOINT))
        d_n = ex.ristretto_decode(enc)
        d_p = ex.ristretto_decode_py(enc)
        assert d_n is not None and ex.pt_eq(d_n, d_p)
    # invalid encodings rejected by both
    bad = bytearray(ex.ristretto_encode(ex.BASEPOINT))
    bad[0] |= 1  # make it odd ('negative')
    assert ex.ristretto_decode(bytes(bad)) == ex.ristretto_decode_py(bytes(bad))
    noncanon = (ex.P + 3).to_bytes(32, "little")
    assert ex.ristretto_decode(noncanon) is None
    assert ex.ristretto_decode_py(noncanon) is None


def test_native_batch_ops_match_python():
    n = 11
    ss = [rng.randrange(ex.L) for _ in range(n)]
    ts = [rng.randrange(ex.L) for _ in range(n)]
    ps = [ex.pt_mul(s, ex.BASEPOINT) for s in ss]
    qs = [ex.pt_mul(t, ex.BASEPOINT) for t in ts]
    # pt_mul_batch
    got = ex.pt_mul_batch(ts, ps)
    want = ex.pt_mul_batch_py(ts, ps)
    assert [ex.ristretto_encode(g) for g in got] == \
        [ex.ristretto_encode(w) for w in want]
    # pt_fold_batch (incl. zero scalars hitting the identity start path)
    aa = [0] + ss[1:]
    bb = ts[:-1] + [0]
    got = ex.pt_fold_batch(aa, bb, ps, qs)
    want = ex.pt_fold_batch_py(aa, bb, ps, qs)
    assert [ex.ristretto_encode(g) for g in got] == \
        [ex.ristretto_encode(w) for w in want]
    # pt_msm_many with ragged rows
    items = [(ss[:3], ps[:3]), (ts[:7], qs[:7]), ([0, 0], ps[:2]), (ss, ps)]
    got = ex.pt_msm_many(items)
    want = ex.pt_msm_many_py(items)
    assert [ex.ristretto_encode(g) for g in got] == \
        [ex.ristretto_encode(w) for w in want]


def test_native_threaded_msm_matches_python():
    # large enough to split across threads (threshold 512/thread)
    n = 2048
    ss = [rng.randrange(ex.L) for _ in range(n)]
    base = [ex.pt_mul(rng.randrange(1, 2**40), ex.BASEPOINT) for _ in range(32)]
    ps = [base[i % 32] for i in range(n)]
    assert ex.ristretto_encode(ex.pt_msm(ss, ps)) == \
        ex.ristretto_encode_py(ex.pt_msm_py(ss, ps))
