"""Sharded end-to-end prover on the virtual 8-device mesh
(parallel/sharded_prover.py): sharded witness MSMs + sharded implicit-basis
IPA must produce proofs byte-identical to the host path and verifiable by
the standard verifier (SURVEY.md section 7 hard part 4 closed end-to-end)."""

import random

import jax
import jax.numpy as jnp
import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import Prover, Verifier, ipp as ipp_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.parallel import make_mesh
from bulletproofs_tpu.parallel import sharded_prover as sp
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(jax.devices()[:8])


def test_sharded_multi_msm(mesh, rng):
    ctx = ej.CurveCtx(bp.curve())
    n = 64
    pts = [G1.random(rng) for _ in range(n)]
    k1 = [Scalar.random(rng) for _ in range(n)]
    k2 = [Scalar.random(rng) for _ in range(n)]
    P = ej.to_device_points(pts, ctx)
    s = jnp.stack([ej.to_device_scalars(k1, ctx),
                   ej.to_device_scalars(k2, ctx)], axis=0)
    out = sp.msm_multi_sharded(P, s, ctx, 4, mesh)
    assert out[0] == msm_host(pts, k1)
    assert out[1] == msm_host(pts, k2)


def test_sharded_ipa_matches_host(mesh, rng):
    n = 32
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    Gf = [Scalar.random(rng) for _ in range(n)]
    Hf = [Scalar.random(rng) for _ in range(n)]

    tr1 = ProofTranscript(b"ipa")
    host_proof = ipp_mod.create_ipp(tr1, Q, Gf, Hf, G, H, a, b)
    tr2 = ProofTranscript(b"ipa")
    L, R, af, bf = sp.create_ipp_sharded(tr2, Q, Gf, Hf, G, H, a, b, mesh)
    assert [p.to_bytes() for p in L] == [p.to_bytes() for p in host_proof.L]
    assert [p.to_bytes() for p in R] == [p.to_bytes() for p in host_proof.R]
    assert af.v == host_proof.a.v and bf.v == host_proof.b.v


def test_sharded_full_proof(mesh):
    """Complete aggregated proof proved on the mesh, verified single-chip."""
    rng = random.Random(0x5EED)
    G = get_generators("G", 32)
    H = get_generators("H", 32)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    tr = ProofTranscript(b"mesh")
    prover = Prover(g, h, tr, rng=rng)
    comms = [bound_check.prove_bounded_num(57, None, 0, 255, 8, rng, prover),
             bound_check.prove_bounded_num(99, None, 0, 255, 8, rng, prover)]
    proof = sp.prove_sharded(prover, G, H, mesh)

    # byte-identical to the host path with the same seed
    rng2 = random.Random(0x5EED)
    tr_h = ProofTranscript(b"mesh")
    prover_h = Prover(g, h, tr_h, rng=rng2)
    bound_check.prove_bounded_num(57, None, 0, 255, 8, rng2, prover_h)
    bound_check.prove_bounded_num(99, None, 0, 255, 8, rng2, prover_h)
    proof_h = prover_h._prove(G, H)
    assert proof.to_bytes() == proof_h.to_bytes()

    tr_v = ProofTranscript(b"mesh")
    verifier = Verifier(tr_v)
    for cm in comms:
        bound_check.verify_bounded_num(0, 255, 8, cm, verifier)
    verifier._verify(proof, g, h, G, H)
