"""Wire-format shuffle payloads for cache_probe's daemon demo."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blobs(m: int, count: int):
    from quisquis_tpu.accounts.accounts import Account
    from quisquis_tpu.accounts.prover import Prover
    from quisquis_tpu.accounts.transcript import Transcript, SeededRng
    from quisquis_tpu.primitives.keys import (RistrettoPublicKey,
                                              RistrettoSecretKey)
    from quisquis_tpu.shuffle.shuffle import Shuffle, ShuffleProof
    from quisquis_tpu.utils import serde

    r = SeededRng(seed=b"probe-payload")
    accounts = []
    for _ in range(m * m):
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
