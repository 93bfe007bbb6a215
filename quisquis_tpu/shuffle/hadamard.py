"""Hadamard product argument (Bayer-thesis style with Lagrange polynomials).

Mirrors /root/reference/src/shuffle/hadamard.rs:79-386, generalized from the
hard-coded 3-row case to any m rows: proves A o B = C for committed m x n
matrices, via quotient-polynomial delta commitments and evaluation openings
at a Fiat-Shamir challenge.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

from ..ops import exact as ex
from ..primitives.pedersen import VectorPedersenGens
from ..accounts.prover import Prover
from ..accounts.verifier import Verifier
from . import polynomial, vectorutil

L = ex.L


def _enc(p):
    return ex.ristretto_encode(p)


@dataclass
class HadamardStatement:
    omega: List[int]  # m interpolation points


@dataclass
class HadamardProof:
    commitment_a_0: bytes
    commitment_b_0: bytes
    commitment_c_0: bytes
    commitment_delta: List[bytes]  # m+1 commitments
    a_bar: List[int]
    b_bar: List[int]
    c_bar: List[int]
    r_bar: int
    s_bar: int
    t_bar: int
    rho_bar: int

    @staticmethod
    def create_hadamard_argument_proof(
        prover: Prover, xpc_gens: VectorPedersenGens,
        a_rows: Sequence[Sequence[int]], b_rows: Sequence[Sequence[int]],
        c_rows: Sequence[Sequence[int]],
        commit_a: Sequence[bytes], commit_b: Sequence[bytes],
        commit_c: Sequence[bytes],
        witness_r: Sequence[int], witness_s: Sequence[int],
        witness_t: Sequence[int],
    ) -> Tuple["HadamardProof", "HadamardStatement"]:
        m = len(a_rows)
        n = len(a_rows[0])
        assert len(commit_a) == len(commit_b) == len(commit_c) == m
        prover.new_domain_sep(b"HadamardProductProof")
        combined = (list(witness_r) + list(witness_s) + list(witness_t) +
                    [x for row in a_rows for x in row] +
                    [x for row in b_rows for x in row] +
                    [x for row in c_rows for x in row])
        rng = prover.prove_rekey_witness_transcript_rng(combined)
        for ca, cb, cc in zip(commit_a, commit_b, commit_c):
            prover.allocate_point(b"c_a", ca)
            prover.allocate_point(b"c_b", cb)
            prover.allocate_point(b"c_c", cc)

        a_0 = [rng.random_scalar() for _ in range(n)]
        b_0 = [rng.random_scalar() for _ in range(n)]
        c_0 = vectorutil.hadamard_product(a_0, b_0)
        r_0 = rng.random_scalar()
        s_0 = rng.random_scalar()
        t_0 = rng.random_scalar()
        c_a_0 = _enc(xpc_gens.commit(a_0, r_0))
        c_b_0 = _enc(xpc_gens.commit(b_0, s_0))
        c_c_0 = _enc(xpc_gens.commit(c_0, t_0))

        omega = [rng.random_scalar() for _ in range(m)]
        l_x_vec = polynomial.create_l_i_x_polynomial(omega)

        a_expr = polynomial.compute_polynomial_expression(l_x_vec, a_rows, a_0)
        b_expr = polynomial.compute_polynomial_expression(l_x_vec, b_rows, b_0)
        c_expr = polynomial.compute_polynomial_expression(l_x_vec, c_rows, c_0)

        # (a.l(X) * b.l(X) - c.l(X)) / l(X), per column
        div_res = [
            (a_expr[j].multiply(b_expr[j]) - c_expr[j]).divide(l_x_vec[0])
            for j in range(n)
        ]
        # delta_i = i-th coefficient across columns
        delta_vec = [[(dr.coefficients[i] if i < len(dr.coefficients) else 0)
                      for dr in div_res] for i in range(m + 1)]

        rho = [rng.random_scalar() for _ in range(m + 1)]
        comit_delta = [_enc(c) for c in xpc_gens.commit_rows(delta_vec, rho)]

        prover.allocate_point(b"c_a_0", c_a_0)
        prover.allocate_point(b"c_b_0", c_b_0)
        prover.allocate_point(b"c_c_0", c_c_0)
        for cd in comit_delta:
            prover.allocate_point(b"c_delta", cd)

        x = prover.get_challenge(b"challenge")
        a_bar = [p.evaluate(x) for p in a_expr]
        b_bar = [p.evaluate(x) for p in b_expr]
        c_bar = [p.evaluate(x) for p in c_expr]
        ev0 = l_x_vec[0].evaluate(x)
        r_bar, s_bar, t_bar = r_0 * ev0 % L, s_0 * ev0 % L, t_0 * ev0 % L
        for i in range(m):
            ev = l_x_vec[i + 1].evaluate(x)
            r_bar = (r_bar + witness_r[i] * ev) % L
            s_bar = (s_bar + witness_s[i] * ev) % L
            t_bar = (t_bar + witness_t[i] * ev) % L
        exp_x = vectorutil.exp_iter(x, m + 1)
        x_i_rho_i = sum(xi * ri for xi, ri in zip(exp_x, rho)) % L
        rho_bar = ev0 * x_i_rho_i % L

        return (HadamardProof(c_a_0, c_b_0, c_c_0, comit_delta, a_bar, b_bar,
                              c_bar, r_bar, s_bar, t_bar, rho_bar),
                HadamardStatement(omega))

    def verify(self, verifier: Verifier, xpc_gens: VectorPedersenGens,
               statement: HadamardStatement,
               commit_a: Sequence[bytes], commit_b: Sequence[bytes],
               commit_c: Sequence[bytes]) -> None:
        m = len(commit_a)
        if len(set(statement.omega)) != m:
            raise ValueError("Hadamard Proof Verify: Omega values are not unique")
        l_x_vec = polynomial.create_l_i_x_polynomial(statement.omega)
        verifier.new_domain_sep(b"HadamardProductProof")
        for ca, cb, cc in zip(commit_a, commit_b, commit_c):
            verifier.allocate_point(b"c_a", ca)
            verifier.allocate_point(b"c_b", cb)
            verifier.allocate_point(b"c_c", cc)
        verifier.allocate_point(b"c_a_0", self.commitment_a_0)
        verifier.allocate_point(b"c_b_0", self.commitment_b_0)
        verifier.allocate_point(b"c_c_0", self.commitment_c_0)
        for cd in self.commitment_delta:
            verifier.allocate_point(b"c_delta", cd)
        x = verifier.get_challenge(b"challenge")

        commit_a_bar = xpc_gens.commit(self.a_bar, self.r_bar)
        commit_b_bar = xpc_gens.commit(self.b_bar, self.s_bar)
        commit_c_bar = xpc_gens.commit(self.c_bar, self.t_bar)

        def recombine(c0_bytes, commits):
            c0 = ex.ristretto_decode(c0_bytes)
            if c0 is None:
                raise ValueError("HadamardProof Verify: Decompression Failed")
            acc = ex.pt_mul(l_x_vec[0].evaluate(x), c0)
            for i, cb in enumerate(commits):
                p = ex.ristretto_decode(cb)
                if p is None:
                    raise ValueError("HadamardProof Verify: Decompression Failed")
                acc = ex.pt_add(acc, ex.pt_mul(l_x_vec[i + 1].evaluate(x), p))
            return acc

        if not (ex.pt_eq(recombine(self.commitment_a_0, commit_a), commit_a_bar)
                and ex.pt_eq(recombine(self.commitment_b_0, commit_b), commit_b_bar)
                and ex.pt_eq(recombine(self.commitment_c_0, commit_c), commit_c_bar)):
            raise ValueError("Hadamard Proof Verify: A_bar , B_bar, C_bar check failed")

        exp_x = vectorutil.exp_iter(x, m + 1)
        cd0 = ex.ristretto_decode(self.commitment_delta[0])
        if cd0 is None:
            raise ValueError("HadamardProof Verify: Decompression Failed")
        acc = cd0
        for i in range(1, m + 1):
            p = ex.ristretto_decode(self.commitment_delta[i])
            if p is None:
                raise ValueError("HadamardProof Verify: Decompression Failed")
            acc = ex.pt_add(acc, ex.pt_mul(exp_x[i], p))
        lhs = ex.pt_mul(l_x_vec[0].evaluate(x), acc)
        ab = vectorutil.hadamard_product(self.a_bar, self.b_bar)
        abc = [(p - q) % L for p, q in zip(ab, self.c_bar)]
        rhs = xpc_gens.commit(abc, self.rho_bar)
        if not ex.pt_eq(lhs, rhs):
            raise ValueError("Hadamard Proof Verify: Delta Commitment check failed")
