"""Constant-work witness-commitment MSM (BP_MSM_CT; VERDICT r3 task 4).

The ct=True native core (bp_msm2_ct / bp_msm2_multi_ct: full-width window
count, zero digits bucketed into the discarded slot 0, no GLV) must produce
the SAME group elements as the var-time core and the exact-int host backend
— the analog of the reference's `G1Vector::inner_product_const_time`
(`/root/reference/src/r1cs/prover.rs:358,423`).  Proof bytes must be
identical with BP_MSM_CT on and off.
"""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu.config import BLS381, BN254, SECP256K1, using_curve
from bulletproofs_tpu.ops.cpp_backend import CppBackend
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar


def _adversarial_scalars(n, r, rng):
    """Zero, one, r-1, tiny, full-width, and bit-vector-like values."""
    vals = [0, 1, r - 1, 2, r - 2, 1, 0, 1]
    vals += [rng.randrange(2) for _ in range(n // 2)]      # bit vector half
    vals += [rng.randrange(r) for _ in range(n - len(vals))]
    rng.shuffle(vals)
    return vals[:n]


@pytest.mark.parametrize("cv", [BLS381, BN254, SECP256K1],
                         ids=["bls381", "bn254", "secp256k1"])
def test_ct_msm_matches_var_time_and_host(cv):
    rng = random.Random(0xC7)
    with using_curve(cv):
        n = 97
        pts = [G1.random(rng) for _ in range(n - 1)] + [G1.identity()]
        vals = _adversarial_scalars(n, cv.r, rng)
        scl = [Scalar(v) for v in vals]
        cb = CppBackend()
        vt = cb.msm(pts, scl)
        ct = cb.msm(pts, scl, ct=True)
        host = msm_host(pts, scl)
        assert ct == vt == host


def test_ct_msm_multi_matches():
    rng = random.Random(0xC8)
    with using_curve(BLS381):
        n = 64
        pts = [G1.random(rng) for _ in range(n)]
        sets = [
            [Scalar(rng.randrange(2)) for _ in range(n)],     # bit vector
            [Scalar.zero()] * n,                              # all zero
            [Scalar.random(rng) for _ in range(n)],           # uniform
        ]
        cb = CppBackend()
        vt = cb.msm_multi(pts, sets)
        ct = cb.msm_multi(pts, sets, ct=True)
        assert ct == vt
        for got, s in zip(ct, sets):
            assert got == msm_host(pts, s)


def test_proof_bytes_identical_ct_on_off(monkeypatch):
    """BP_MSM_CT toggling never changes proof bytes (the addition schedule
    changes, the group elements do not)."""
    from bulletproofs_tpu.models.bound_check import (
        gen_proof_of_bounded_num)

    def mk():
        rng = random.Random(42)
        G = bp.get_generators("G", 128)
        H = bp.get_generators("H", 128)
        g = bp.G1.from_msg_hash(b"g")
        h = bp.G1.from_msg_hash(b"h")
        proof, comms = gen_proof_of_bounded_num(
            55, bp.Scalar(77), 10, 100, 32, rng, b"ct", g, h, G, H)
        return proof.to_bytes(), [c.to_bytes() for c in comms]

    monkeypatch.setenv("BP_MSM_CT", "1")
    on = mk()
    monkeypatch.setenv("BP_MSM_CT", "0")
    off = mk()
    assert on == off
