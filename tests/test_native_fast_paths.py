"""Regression coverage for the round-3 native fast paths: the GLV fold
ladder, the native keccak-f[1600] permutation, and the native-resident IPA
round loop — each cross-checked against the exact host-int ground truth
(and, for keccak, the pure-Python reference implementation).

These paths must stay BIT-EXACT with the host backend (CLAUDE.md
invariant); the protocol-level equivalents are additionally pinned by
tests/test_golden_vectors.py.
"""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu import ipp as ipp_mod
from bulletproofs_tpu.backend import HostBackend
from bulletproofs_tpu.config import CURVES, using_curve
from bulletproofs_tpu.ops.cpp_backend import CppBackend
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript.protocol import ProofTranscript


@pytest.fixture
def rng():
    return random.Random(0xF01D)


@pytest.mark.parametrize("cname", ["bls381", "bn254", "secp256k1"])
def test_glv_fold_matches_host(cname, rng):
    """fold_points through bp_fold2 (GLV 16-entry joint ladder on bls381/
    bn254, plain ladder on secp256k1) vs host ints, including the 1-way
    remainder lanes (n % 8 != 0) and edge scalars."""
    cpp, host = CppBackend(), HostBackend()
    with using_curve(CURVES[cname]):
        n = 21          # 2 full 8-lane groups + 5 remainder lanes
        PL = [bp.G1.from_msg_hash(b"fL%d" % i) for i in range(n)]
        PR = [bp.G1.from_msg_hash(b"fR%d" % i) for i in range(n)]
        s1 = [Scalar.random(rng) for _ in range(n)]
        s2 = [Scalar.random(rng) for _ in range(n)]
        s1[0] = Scalar(0)
        s2[0] = Scalar(0)
        s1[1] = Scalar(1)
        s2[1] = Scalar.zero() - Scalar(1)          # r - 1
        s1[2] = Scalar(2) ** 127                   # GLV split boundary
        s2[2] = Scalar(3)
        assert cpp.fold_points(PL, PR, s1, s2) == \
            host.fold_points(PL, PR, s1, s2)
        # broadcast (shared-scalar) form, as the IPA rounds use it
        u = Scalar.random(rng)
        ui = u.inverse()
        assert cpp.fold_points(PL, PR, u, ui) == \
            host.fold_points(PL, PR, u, ui)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 7])
def test_small_fold_pads_to_8_lanes(n, rng):
    """fold_points pads 1..7-element batches to a full 8-lane IFMA group
    with zero-scalar dup lanes (the Pedersen commit path, commit_many) —
    results must match the host fold exactly, incl. zero scalars."""
    cpp, host = CppBackend(), HostBackend()
    with using_curve(CURVES["bls381"]):
        PL = [bp.G1.from_msg_hash(b"sL%d" % i) for i in range(n)]
        PR = [bp.G1.from_msg_hash(b"sR%d" % i) for i in range(n)]
        s1 = [Scalar.random(rng) for _ in range(n)]
        s2 = [Scalar.random(rng) for _ in range(n)]
        if n > 1:
            s1[1] = Scalar(0)
        assert cpp.fold_points(PL, PR, s1, s2) == \
            host.fold_points(PL, PR, s1, s2)


def test_native_keccak_matches_python(rng):
    import bulletproofs_tpu.transcript.keccak as kk
    assert kk._get_native(), "native keccak should be available under tests"
    for _ in range(20):
        s1 = bytearray(rng.randbytes(200))
        s2 = bytearray(s1)
        kk.keccak_f1600(s1)                        # native
        kk._native = False                         # force the Python path
        try:
            kk.keccak_f1600(s2)
        finally:
            kk._native = None
        assert s1 == s2


@pytest.mark.parametrize("cname", ["bls381", "secp256k1", "ed25519"])
@pytest.mark.parametrize("n", [2, 4, 8, 64, 128])
def test_native_ipp_rounds_byte_identical(cname, n, rng):
    """create_ipp through the native-resident PAIRED round loop (cpp
    backend: deferred base folds, bp_ipp_round_lr_exp + bp_fold4) vs the
    generic Python loop (host backend): identical L/R/a/b.  n spans even
    (64: 6 rounds) and odd (8, 128) round counts and the no-pair floor
    (n=2, 4)."""
    with using_curve(CURVES[cname]):
        G = bp.get_generators("nipG", n)
        H = bp.get_generators("nipH", n)
        Q = bp.G1.from_msg_hash(b"Q")
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        y = Scalar.random(rng)
        Gf = [Scalar(1)] * n
        Hf = [y ** i for i in range(n)]
        try:
            backend_mod.set_backend("cpp")
            tr = ProofTranscript(b"nipa")
            pf_native = ipp_mod.create_ipp(tr, Q, Gf, Hf, G, H, a, b)
            backend_mod.set_backend("host")
            tr = ProofTranscript(b"nipa")
            pf_host = ipp_mod.create_ipp(tr, Q, Gf, Hf, G, H, a, b)
        finally:
            backend_mod.set_backend("auto")
        assert pf_native.a == pf_host.a and pf_native.b == pf_host.b
        assert pf_native.L == pf_host.L and pf_native.R == pf_host.R


@pytest.mark.parametrize("cname", ["bls381", "secp256k1"])
def test_batch_affine_msm_matches(cname, rng):
    """BP_MSM_AFFINE=1 batch-affine bucket pass vs the default projective
    pass and the host ground truth, including duplicate points (in-bucket
    doubling), P/-P cancellation, identities and zero scalars.  The affine
    pass measured slower on this host (see native source) but must stay
    bit-exact."""
    import os
    cpp, host = CppBackend(), HostBackend()
    with using_curve(CURVES[cname]):
        n = 200
        pts = [bp.G1.from_msg_hash(b"ba%d" % i) for i in range(n)]
        pts[10] = pts[11]
        pts[12] = -pts[11]
        pts[13] = bp.G1.identity()
        ks = [Scalar.random(rng) for _ in range(n)]
        ks[11] = ks[10]
        ks[12] = ks[10]
        ks[14] = Scalar(0)
        want = host.msm(pts, ks)
        os.environ["BP_MSM_AFFINE"] = "1"
        try:
            assert cpp.msm(pts, ks) == want
            dup = [pts[0]] * 48
            kd = [Scalar(i + 1) for i in range(48)]
            assert cpp.msm(dup, kd) == host.msm(dup, kd)
        finally:
            del os.environ["BP_MSM_AFFINE"]
        assert cpp.msm(pts, ks) == want
