"""Host G1 group law (complete projective formulas)."""

import random

import pytest

from bulletproofs_tpu.config import BLS381, BN254, using_curve, curve
from bulletproofs_tpu.ops.ec_host import (G1, commit_to_field_element,
                                          msm_host)
from bulletproofs_tpu.ops.field_host import Scalar


@pytest.mark.parametrize("cv", [BLS381, BN254])
def test_generator_on_curve_and_order(cv):
    with using_curve(cv):
        g = G1.generator()
        assert g.is_on_curve()
        assert (g * Scalar(cv.r - 1) + g).is_identity()


@pytest.mark.parametrize("cv", [BLS381, BN254])
def test_group_axioms(cv):
    rng = random.Random(4)
    with using_curve(cv):
        g = G1.generator()
        p = g * Scalar.random(rng)
        q = g * Scalar.random(rng)
        r = g * Scalar.random(rng)
        ident = G1.identity()
        assert p + q == q + p
        assert (p + q) + r == p + (q + r)
        assert p + ident == p
        assert ident + p == p
        assert (p - p).is_identity()
        assert p + p == p * Scalar(2)
        assert p.double() + p == p * Scalar(3)
        assert all((p + q).is_on_curve() for _ in [0])


def test_scalar_mul_linearity():
    rng = random.Random(5)
    g = G1.generator()
    a, b = Scalar.random(rng), Scalar.random(rng)
    assert g * a + g * b == g * (a + b)
    assert (g * a) * b == g * (a * b)
    assert g.binary_scalar_mul(g * Scalar(2), a, b) == g * (a + b * 2)


def test_hash_to_curve():
    p1 = G1.from_msg_hash(b"g1")
    p2 = G1.from_msg_hash(b"g2")
    assert p1.is_on_curve() and p2.is_on_curve()
    assert p1 != p2
    assert p1 == G1.from_msg_hash(b"g1")  # deterministic
    # cofactor cleared: r * P == identity
    assert (p1 * Scalar(curve().r - 1) + p1).is_identity()


def test_serialization():
    rng = random.Random(6)
    p = G1.generator() * Scalar.random(rng)
    data = p.to_bytes()
    assert len(data) == curve().point_bytes
    assert data[0] == 4
    assert G1.from_bytes(data) == p
    # amcl identity convention: x=0, y=1
    ident = G1.identity()
    enc = ident.to_bytes()
    assert enc[0] == 4 and enc[1:49] == b"\x00" * 48
    assert G1.from_bytes(enc).is_identity()


def test_msm_host():
    rng = random.Random(7)
    g = G1.generator()
    pts = [g * Scalar.random(rng) for _ in range(9)]
    ks = [Scalar.random(rng) for _ in range(9)]
    expected = G1.identity()
    for p, k in zip(pts, ks):
        expected = expected + p * k
    assert msm_host(pts, ks) == expected
    assert msm_host([], []).is_identity()


def test_pedersen_commit():
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    v, r = Scalar(42), Scalar(99)
    assert commit_to_field_element(g, h, v, r) == g * v + h * r
