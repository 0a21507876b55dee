"""ed25519 runtime curve (reference cargo feature `ed25519`,
`/root/reference/Cargo.toml:27`).

AMCL's ed25519 group is the prime-order subgroup of Curve25519; here it is
represented in short Weierstrass form (config.py ED25519), exercising the
general a != 0 complete addition (RCB16 algorithm 1) across all three
backends — the other curves only cover the a = 0 specialization.
"""

import random

import pytest

from bulletproofs_tpu.config import ED25519, using_curve
from bulletproofs_tpu.models import bound_check, set_membership
from bulletproofs_tpu.models import poseidon_hash as ph
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, Poseidon_hash_2, SboxType)
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import get_generators


def test_ed25519_group_law():
    with using_curve(ED25519):
        g = G1.generator()
        assert g.is_on_curve()
        assert (g + G1.identity()) == g
        assert (g + (-g)).is_identity()
        assert (g + g) == g._mul_int(2)
        # prime-order subgroup: r * G = identity
        assert (g * Scalar(ED25519.r - 1) + g).is_identity()
        # hash-to-curve output is on curve AND in the subgroup (cofactor 8
        # cleared)
        h = G1.from_msg_hash(b"hello")
        assert h.is_on_curve()
        assert (h * Scalar(ED25519.r - 1) + h).is_identity()
        assert G1.from_bytes(h.to_bytes()) == h


def test_ed25519_cross_backend():
    """host ints vs native C++ vs jax limb kernels, bit-exact (the general-a
    RCB16 branch in all three)."""
    with using_curve(ED25519):
        rnd = random.Random(0xED)
        pts = [G1.random(rnd) for _ in range(16)]
        ks = [Scalar.random(rnd) for _ in range(16)]
        want_msm = msm_host(pts, ks)
        want_fold = [p.binary_scalar_mul(q, a, b) for p, q, a, b in
                     zip(pts[:4], pts[4:8], ks[:4], ks[4:8])]

        from bulletproofs_tpu.ops.cpp_backend import CppBackend
        cb = CppBackend()
        assert cb.msm(pts, ks) == want_msm
        assert cb.fold_points(pts[:4], pts[4:8], ks[:4], ks[4:8]) == want_fold

        from bulletproofs_tpu.ops import ec_jax as ej
        from bulletproofs_tpu.ops import msm as msm_mod
        ctx = ej.CurveCtx(ED25519)
        P = ej.to_device_points(pts, ctx)
        s = ej.to_device_scalars(ks, ctx)
        out = msm_mod.msm_device(P, s, ctx, 4)
        assert ej.from_device_points(out, ctx)[0] == want_msm
        folded = ej.ec_pair_fold(P[:, :, :4], P[:, :, 4:8],
                                 s[:, :4], s[:, 4:8], ctx)
        assert ej.from_device_points(folded, ctx) == want_fold


def test_ed25519_gadget_suite(rng):
    """Range proof + set membership + Poseidon preimage on ed25519."""
    with using_curve(ED25519):
        G = get_generators("G", 512)
        H = get_generators("H", 512)
        g = G1.from_msg_hash(b"g")
        h = G1.from_msg_hash(b"h")

        proof, comms = bound_check.gen_proof_of_bounded_num(
            42, None, 0, 1 << 16, 16, rng, b"ed", g, h, G, H)
        bound_check.verify_proof_of_bounded_num(
            0, 1 << 16, 16, proof, comms, b"ed", g, h, G, H)

        sv = [Scalar(v) for v in (5, 9, 1, 100)]
        proof, comms = set_membership.gen_proof_of_set_membership(
            Scalar(9), None, sv, rng, b"edset", g, h, G, H)
        set_membership.verify_proof_of_set_membership(
            sv, proof, comms, b"edset", g, h, G, H)

        params = PoseidonParams(3, 4, 4, 55)
        xl, xr = Scalar.random(rng), Scalar.random(rng)
        image = Poseidon_hash_2(xl, xr, params, SboxType.Cube)
        proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_2(
            [xl, xr], None, image, params, SboxType.Cube, rng,
            b"edpos", g, h, G, H)
        ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_2(
            image, params, SboxType.Cube, proof, comms, b"edpos", g, h, G, H)


def test_ed25519_edwards_serialization():
    """Round-4 AMCL parity: point bytes are TWISTED EDWARDS coordinates
    (AMCL CURVETYPE EDWARDS tobytes layout).  The Weierstrass generator
    must serialize to the STANDARD Ed25519 base point (x_B, 4/5) — pinning
    both the Edwards map and the ed_c sign choice."""
    with using_curve(ED25519):
        g = G1.generator()
        p = ED25519.p
        x_B = 0x216936D3CD6E53FEC0A4E231FDD6DC5C692CC7609525A7B2C9562D608F25D51A
        y_B = 4 * pow(5, -1, p) % p
        want = b"\x04" + x_B.to_bytes(32, "big") + y_B.to_bytes(32, "big")
        assert g.to_bytes() == want
        assert G1.from_bytes(want) == g

        # Edwards round-trip + on-curve for arbitrary subgroup points
        rng = random.Random(0xEDE)
        for _ in range(6):
            pt = G1.random(rng)
            x_e, y_e = pt.to_edwards()
            assert (-(x_e * x_e) + y_e * y_e) % p == \
                (1 + ED25519.ed_d * x_e % p * x_e % p * y_e % p * y_e) % p
            assert G1.from_edwards(x_e, y_e) == pt
            assert G1.from_bytes(pt.to_bytes()) == pt

        # identity encodes as the Edwards neutral (0, 1)
        ident = G1.identity()
        assert ident.to_bytes() == \
            b"\x04" + (0).to_bytes(32, "big") + (1).to_bytes(32, "big")
        assert G1.from_bytes(ident.to_bytes()).is_identity()

        # group homomorphism through the map: ser(P+Q) decodes to P+Q
        a, b = G1.random(rng), G1.random(rng)
        assert G1.from_bytes(a.to_bytes()) + G1.from_bytes(b.to_bytes()) \
            == (a + b)

        # off-curve Edwards bytes and order-2/4 encodings must be rejected
        import pytest as _pytest
        bad = bytearray(want)
        bad[40] ^= 1
        with _pytest.raises(AssertionError):
            G1.from_bytes(bytes(bad))
        two_tor = b"\x04" + (0).to_bytes(32, "big") + (p - 1).to_bytes(32, "big")
        with _pytest.raises(AssertionError):
            G1.from_bytes(two_tor)


def test_ed25519_mapit_edwards_semantics():
    """from_msg_hash follows AMCL's EDWARDS mapit: try-and-increment x on
    the Edwards equation, even-parity y BEFORE cofactor clearing, then x8.
    Re-derive one generator by hand and compare."""
    import hashlib
    with using_curve(ED25519):
        p, d = ED25519.p, ED25519.ed_d
        msg = b"G1"
        x = int.from_bytes(hashlib.shake_256(msg).digest(32), "big") % p

        def sqrt5mod8(n):
            y = pow(n, (p + 3) // 8, p)
            if y * y % p != n:
                y = y * pow(2, (p - 1) // 4, p) % p
            return y if y * y % p == n % p else None

        while True:
            rhs = (x * x + 1) * pow(1 - d * x * x % p, -1, p) % p
            y = sqrt5mod8(rhs)
            if y is not None:
                break
            x += 1
        if y & 1:
            y = p - y
        want = G1.from_edwards(x, y)._mul_int(8)
        assert G1.from_msg_hash(msg) == want
