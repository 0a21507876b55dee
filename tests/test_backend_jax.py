"""End-to-end proof through the JAX device backend: the full prover/verifier
pipeline (witness-commitment MSMs, IPA folds, verifier mega-MSM) running on
batched limb kernels instead of the host integer backend."""

import pytest

from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.utils import get_generators


@pytest.fixture
def jax_backend():
    old_mode = backend_mod._mode
    old_thresh = backend_mod.DEVICE_THRESHOLD
    backend_mod.set_backend("jax")
    backend_mod.DEVICE_THRESHOLD = 1
    yield
    backend_mod.set_backend(old_mode)
    backend_mod.DEVICE_THRESHOLD = old_thresh


def test_range_proof_on_device_backend(jax_backend, rng):
    """BASELINE config #1 (single range proof), device compute path."""
    n_bits = 8                       # small: CI compiles stay bounded
    G = get_generators("G", 32)
    H = get_generators("H", 32)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    proof, comms = bound_check.gen_proof_of_bounded_num(
        57, None, 10, 100, n_bits, rng, b"BoundCheck", g, h, G, H)
    bound_check.verify_proof_of_bounded_num(
        10, 100, n_bits, proof, comms, b"BoundCheck", g, h, G, H)


def test_conv_cache_content_keyed(rng):
    """Regression (ADVICE r1): the host->device conversion cache must key on
    point CONTENT.  Two different lists that could alias by id()/len must not
    be served each other's device arrays, and identical content in a fresh
    list object must hit."""
    import random
    from bulletproofs_tpu.ops.jax_backend import JaxBackend
    from bulletproofs_tpu.ops import ec_jax as ej
    from bulletproofs_tpu.config import curve
    from bulletproofs_tpu.ops.field_host import Scalar
    from bulletproofs_tpu.ops.ec_host import msm_host

    be = JaxBackend()
    ctx = ej.CurveCtx(curve())
    rnd = random.Random(7)
    pts_a = [G1.random(rnd) for _ in range(8)]
    scalars = [Scalar(i + 1) for i in range(8)]

    out_a = be.msm(pts_a, scalars)
    del pts_a
    # a fresh list at (possibly) the same address with the same length but
    # DIFFERENT contents must not get the stale device points
    pts_b = [G1.random(rnd) for _ in range(8)]
    out_b = be.msm(pts_b, scalars)
    assert out_b == msm_host(pts_b, scalars)
    # identical content in a brand-new list object: cache hit, same result
    pts_c = list(pts_b)
    assert be._gen_cache.get(pts_c, ctx) is be._gen_cache.get(pts_b, ctx)
    assert be.msm(pts_c, scalars) == out_b
