"""Pinned golden challenges for all 9 sigma protocols (VERDICT r2 item 6).

One seeded stream drives witnesses for every protocol in a fixed order;
each protocol's Fiat-Shamir challenge is pinned. A change in any
protocol's label schedule, append order, first-message math, or
witness-rekeyed RNG framing fails exactly that protocol's pin (framing
bugs become diagnosable to the protocol, not just "a pin moved").

Reference protocols: /root/reference/src/accounts/prover.rs:120-951.
"""

import hashlib

from quisquis_tpu.ops import exact as ex
from quisquis_tpu.primitives.keys import RistrettoPublicKey, RistrettoSecretKey
from quisquis_tpu.primitives.elgamal import ElGamalCommitment
from quisquis_tpu.primitives.pedersen import default_pedersen_gens
from quisquis_tpu.accounts.accounts import Account
from quisquis_tpu.accounts.transcript import Transcript, SeededRng
from quisquis_tpu.accounts.prover import Prover
from quisquis_tpu.accounts.rangeproof import RangeProofProver

L = ex.L

PINS = {
    "delta_compact": 0x6487540c7f0e1f40c03324c994ec59d98eb749f511512177ecb748386522ed,
    "update_account": 0x913d1214d41815ee65689e5cb7a1ecb9b50a54a821f50cb29ab6c4c3d05a109,
    "sender_account": 0x1173ccfa1bd3fd305ea15717b6d2d97c986623d4b26a0d46647e084e1fa0316,
    "non_negative_r1cs_sha": "dbf42536582f400af4787e814b9d96214d4a6f04cc28edc06a66cf9d1c3e9f73",
    "zero_balance_vector": 0xd3746362b2d060da3fdbcae254c28388731f483d1c3dc5458a91184bf97ffc4,
    "zero_balance_single": 0x2dc1803a930b0558be64dfa9ca118c7e88a95d11af2e2473a64fad7b62ed07,
    "destroy_account": 0xa03df71749fa3193f74e0300e20d3ab5a361360a82d41df13de69299473b45,
    "same_value": 0xadd9f56f799295901fa07600a207c5e7255521ba9d94e484af820542aa7b550,
    "dark_tx_update": 0xf004265ff6b7e1b7ebdecf910017ebbc2635878f544822d2f762582ba3cdbe5,
}


def test_sigma_protocol_challenges_pinned():
    r = SeededRng(seed=b"sigma-golden-r3")
    base_pk = RistrettoPublicKey.generate_base_pk()
    values = [(-5) % L, 5] + [0] * 7
    accounts, sks = [], []
    for _ in range(9):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        acc, _ = Account.generate_account(pk, r)
        accounts.append(Account.update_account(
            acc, 0, r.random_scalar(), r.random_scalar()))
        sks.append(sk)
    delta, epsilon, rscalars = Account.create_delta_and_epsilon_accounts(
        accounts, values, base_pk, r)

    # 1. delta-compact DLEQ (prover.rs:120-253)
    p = Prover(b"DLEQProof", Transcript(b"DeltaCompact"), rng=r)
    x = Prover.verify_delta_compact_prover(
        delta, epsilon, rscalars, values, p).get_dleq()[3]
    assert x == PINS["delta_compact"]

    # 2. update-account DLOG (prover.rs:264-342)
    updated_delta = Account.update_delta_accounts(accounts, delta)
    p = Prover(b"DLOGProof", Transcript(b"UpdateAccount"), rng=r)
    x = Prover.verify_update_account_prover(
        accounts[2:9], updated_delta[2:9], rscalars[2:9], p).get_dlog()[1]
    assert x == PINS["update_account"]

    # 3. sender-account DLEQ (prover.rs:355-505)
    p = Prover(b"DLEQProof", Transcript(b"SenderAccount"), rng=r)
    _, _, sig = Prover.verify_account_prover(
        updated_delta[:1], [0], [sks[0]], p, base_pk)
    assert sig.get_dleq()[3] == PINS["sender_account"]

    # 4. non-negative R1CS gadget (prover.rs:514-534): pin the proof bytes
    rp = RangeProofProver(Transcript(b"Rangeproof.r1cs"), rng=r)
    Prover.verify_non_negative_prover(
        [7, 9], [r.random_scalar(), r.random_scalar()], rp)
    proof = rp.build_proof()
    assert hashlib.sha256(proof.to_bytes()).hexdigest() \
        == PINS["non_negative_r1cs_sha"]

    # 5/6. zero-balance vector + single (prover.rs:602-704)
    zacc, zsc = [], []
    pkz = RistrettoPublicKey.from_secret_key(RistrettoSecretKey.random(r), r)
    for _ in range(3):
        a, cs = Account.generate_account(
            RistrettoPublicKey.update_public_key(pkz, r.random_scalar()), r)
        zacc.append(a)
        zsc.append(cs)
    p = Prover(b"DLOGProof", Transcript(b"ZeroVec"), rng=r)
    x = Prover.zero_balance_account_vector_prover(zacc, zsc, p).get_dlog()[1]
    assert x == PINS["zero_balance_vector"]
    p = Prover(b"DLOGProof", Transcript(b"ZeroOne"), rng=r)
    x = Prover.zero_balance_account_prover(zacc[0], zsc[0], p).get_dlog()[1]
    assert x == PINS["zero_balance_single"]

    # 7. destroy-account (prover.rs:715-772)
    dacc, dsks = [], []
    for _ in range(2):
        sk = RistrettoSecretKey.random(r)
        pk = RistrettoPublicKey.from_secret_key(sk, r)
        a, _ = Account.generate_account(pk, r)
        dacc.append(a)
        dsks.append(sk)
    p = Prover(b"DLOGProof", Transcript(b"Destroy"), rng=r)
    x = Prover.destroy_account_prover(dacc, dsks, p).get_dlog()[1]
    assert x == PINS["destroy_account"]

    # 8. same-value compact DLEQ (prover.rs:784-847)
    pc = default_pedersen_gens()
    sk = RistrettoSecretKey.random(r)
    pk = RistrettoPublicKey.from_secret_key(sk, r)
    acc, _ = Account.generate_account(pk, r)
    rs = r.random_scalar()
    eps = Account.create_epsilon_account(base_pk, rs, 42)
    ped = ex.ristretto_encode(pc.commit(42, rs))
    x = Prover.same_value_compact_prover(eps, rs, 42, ped, rng=r).get_dleq()[3]
    assert x == PINS["same_value"]

    # 9. dark-tx update DLOG (prover.rs:864-951)
    pk_r, comm_r = r.random_scalar(), r.random_scalar()
    outs = []
    for a in accounts[:2]:
        newpk = RistrettoPublicKey.update_public_key(a.pk, pk_r)
        zero_comm = ElGamalCommitment.generate_commitment(a.pk, comm_r, 0)
        outs.append(Account(
            newpk, ElGamalCommitment.add_commitments(a.comm, zero_comm)))
    p = Prover(b"DLOGProof", Transcript(b"DarkTx"), rng=r)
    x = Prover.verify_update_account_dark_tx_prover(
        accounts[:2], outs, pk_r, comm_r, p).get_dlog()[1]
    assert x == PINS["dark_tx_update"]
