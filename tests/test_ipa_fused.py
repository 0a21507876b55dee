"""Fused device IPA (one dispatch for all rounds + device transcript) vs
the per-round device path and the host path: byte-identical proofs AND
byte-identical transcript continuation (VERDICT r3 task 2)."""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.ops import prover_device
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators


@pytest.fixture
def jax_backend(monkeypatch):
    old = backend_mod._mode
    backend_mod.set_backend("jax")
    yield
    backend_mod.set_backend(old)


def _ipa_inputs(n, seed):
    from bulletproofs_tpu.ops.ec_host import G1
    from bulletproofs_tpu.ops.field_host import Scalar
    rng = random.Random(seed)
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    Gf = [Scalar.random(rng) for _ in range(n)]
    Hf = [Scalar.random(rng) for _ in range(n)]
    return Q, Gf, Hf, G, H, a, b


def test_fused_matches_per_round_and_continues(jax_backend, monkeypatch):
    from bulletproofs_tpu import ipp as ipp_mod
    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1)
    n = 16
    args = _ipa_inputs(n, 0xF0)

    monkeypatch.setenv("BP_IPA_FUSED", "1")
    tr_f = ProofTranscript(b"fusion")
    proof_f = ipp_mod.create_ipp(tr_f, *args)
    after_f = tr_f.challenge_scalar(b"post")     # transcript continuity

    monkeypatch.setenv("BP_IPA_FUSED", "0")
    tr_p = ProofTranscript(b"fusion")
    proof_p = ipp_mod.create_ipp(tr_p, *args)
    after_p = tr_p.challenge_scalar(b"post")

    assert [p.to_bytes() for p in proof_f.L] == \
           [p.to_bytes() for p in proof_p.L]
    assert [p.to_bytes() for p in proof_f.R] == \
           [p.to_bytes() for p in proof_p.R]
    assert proof_f.a.v == proof_p.a.v
    assert proof_f.b.v == proof_p.b.v
    assert after_f.v == after_p.v


def test_fused_proof_verifies(jax_backend, monkeypatch):
    from bulletproofs_tpu import ipp as ipp_mod
    from bulletproofs_tpu.ops.ec_host import msm_host
    from bulletproofs_tpu.ops.field_host import inner_product
    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1 << 30)  # host verify
    n = 16
    Q, Gf, Hf, G, H, a, b = _ipa_inputs(n, 0xF1)
    monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1)
    monkeypatch.setenv("BP_IPA_FUSED", "1")
    proof = ipp_mod.create_ipp(ProofTranscript(b"fv"), Q, Gf, Hf,
                               G, H, a, b)
    # host-side verification of the fused-prover proof
    backend_mod.set_backend("cpp")
    try:
        monkeypatch.setattr(ipp_mod, "DEVICE_IPA_MIN_N", 1 << 30)
        scalars = ([x * f for x, f in zip(a, Gf)]
                   + [x * f for x, f in zip(b, Hf)]
                   + [inner_product(a, b)])
        P = msm_host(list(G) + list(H) + [Q], scalars)
        ipp_mod.verify_ipp(n, ProofTranscript(b"fv"), Gf, Hf, P, Q, G, H,
                           proof.a, proof.b, proof.L, proof.R)
    finally:
        backend_mod.set_backend("jax")
