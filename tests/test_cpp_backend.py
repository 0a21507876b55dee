"""Native C++ backend cross-checks against the exact Python host backend."""

import pytest

from bulletproofs_tpu.config import BLS381, BN254, using_curve
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar


@pytest.fixture(scope="module")
def cpp():
    from bulletproofs_tpu.ops.cpp_backend import CppBackend, get_lib
    get_lib()
    return CppBackend()


@pytest.mark.parametrize("cv", [BLS381, BN254], ids=lambda c: c.name)
def test_cpp_ops_match_host(cpp, cv, rng):
    with using_curve(cv):
        n = 20
        pts = [G1.random(rng) for _ in range(n - 1)] + [G1.identity()]
        qts = [G1.random(rng) for _ in range(n)]
        ks = [Scalar.random(rng) for _ in range(n)]
        ks[3] = Scalar(0)
        assert cpp.msm(pts, ks) == msm_host(pts, ks)
        s1 = [Scalar.random(rng) for _ in range(n)]
        s2 = [Scalar.random(rng) for _ in range(n)]
        got = cpp.fold_points(pts, qts, s1, s2)
        assert got == [p.binary_scalar_mul(q, a, b)
                       for p, q, a, b in zip(pts, qts, s1, s2)]
        got = cpp.scalar_mul_batch(pts, ks)
        assert got == [p * k for p, k in zip(pts, ks)]


def test_range_proof_on_cpp_backend(rng):
    """Full prove/verify pipeline on the native backend."""
    from bulletproofs_tpu import backend as backend_mod
    from bulletproofs_tpu.models import bound_check
    from bulletproofs_tpu.utils import get_generators

    old = backend_mod._mode
    backend_mod.set_backend("cpp")
    try:
        G = get_generators("G", 128)
        H = get_generators("H", 128)
        g = G1.from_msg_hash(b"g")
        h = G1.from_msg_hash(b"h")
        proof, comms = bound_check.gen_proof_of_bounded_num(
            57, None, 10, 100, 32, rng, b"BoundCheckCpp", g, h, G, H)
        bound_check.verify_proof_of_bounded_num(
            10, 100, 32, proof, comms, b"BoundCheckCpp", g, h, G, H)
    finally:
        backend_mod.set_backend(old)


def test_glv_block_bls381(cpp, rng):
    """bls381 must enable GLV (lam = z^2 - 1 is 128 bits) with a validated
    (lam, beta) pair: psi(P) = (beta*x, y) == lam*P for random points."""
    from bulletproofs_tpu.ops.cpp_backend import _CurveABI

    abi = _CurveABI(BLS381)
    blk = abi.glv_block()
    assert int(blk[0]) == 1
    lam = sum(int(blk[1 + j]) << (64 * j) for j in range(4))
    beta = sum(int(blk[10 + j]) << (64 * j) for j in range(8))
    r, p = BLS381.r, BLS381.p
    assert (lam * lam + lam + 1) % r == 0
    assert (beta * beta + beta + 1) % p == 0
    assert lam.bit_length() <= 129
    with using_curve(BLS381):
        for _ in range(3):
            P = G1.random(rng)
            zi = pow(P.Z, -1, p)
            x, y = P.X * zi % p, P.Y * zi % p
            assert G1(beta * x % p, y, 1, BLS381) == P * lam


@pytest.mark.parametrize("cv", [BLS381, BN254], ids=lambda c: c.name)
def test_cpp_msm_signed_glv_larger(cpp, cv, rng):
    """Exercise the signed-digit + GLV native core at a size that spans
    several windows, with degenerate scalars mixed in (0, 1, r-1, tiny,
    2^k boundaries) — the recode carry chain and negative-digit scheduling
    must reproduce the exact host sum."""
    with using_curve(cv):
        n = 700
        pts = [G1.random(rng) for _ in range(n)]
        ks = [Scalar.random(rng) for _ in range(n)]
        ks[0] = Scalar(0)
        ks[1] = Scalar(1)
        ks[2] = Scalar(cv.r - 1)
        ks[3] = Scalar(cv.r - 2)
        ks[4] = Scalar(255)          # all-max low window
        ks[5] = Scalar(1 << 128)
        ks[6] = Scalar((1 << 129) - 1)
        pts[7] = G1.identity()
        assert cpp.msm(pts, ks) == msm_host(pts, ks)


def test_cpp_msm2_matches_legacy_path(cpp, rng, monkeypatch):
    """bp_msm2 (native normalization + signed digits + GLV) and the legacy
    bp_msm path (Python normalization, unsigned digits) must agree."""
    n = 150
    pts = [G1.random(rng) for _ in range(n)]
    ks = [Scalar.random(rng) for _ in range(n)]
    new = cpp.msm(pts, ks)
    monkeypatch.setenv("BP_CPP_LEGACY_MSM", "1")
    assert cpp.msm(pts, ks) == new


def test_cpp_msm_identity_and_zero_scalars(rng):
    """The affine-input MSM path cannot encode the identity point: the
    driver must zero its scalar instead (digit-0 entries are never
    scheduled).  Identity points DO occur in production mega-MSMs
    (A_I2/A_O2/S2 are identity for 1-phase proofs)."""
    from bulletproofs_tpu.ops.cpp_backend import CppBackend
    from bulletproofs_tpu.ops.ec_host import msm_host
    from bulletproofs_tpu.ops.field_host import Scalar

    cb = CppBackend()
    pts = [G1.random(rng) for _ in range(24)]
    pts[0] = G1.identity()
    pts[11] = G1.identity()
    pts[23] = G1.identity()
    ks = [Scalar.random(rng) for _ in range(24)]
    ks[5] = Scalar.zero()
    assert cb.msm(pts, ks) == msm_host(pts, ks)
    # all-identity edge
    ident = [G1.identity()] * 4
    assert cb.msm(ident, ks[:4]).is_identity()
