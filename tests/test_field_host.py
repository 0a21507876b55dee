"""Host scalar field F_r."""

import random

import pytest

from bulletproofs_tpu.config import BLS381, BN254, using_curve
from bulletproofs_tpu.ops.field_host import (Scalar, batch_invert,
                                             inner_product,
                                             vandermonde_vector)


@pytest.mark.parametrize("cv", [BLS381, BN254])
def test_ring_axioms(cv):
    rng = random.Random(1)
    with using_curve(cv):
        for _ in range(50):
            a, b, c = (Scalar.random(rng) for _ in range(3))
            assert a + b == b + a
            assert (a + b) + c == a + (b + c)
            assert a * (b + c) == a * b + a * c
            assert a - a == Scalar.zero()
            assert a * Scalar.one() == a
            if not a.is_zero():
                assert a * a.inverse() == Scalar.one()
            assert a * Scalar.minus_one() == -a
            assert a.square() == a * a


def test_batch_invert():
    rng = random.Random(2)
    elems = [Scalar.random(rng) for _ in range(33)]
    invs, prod_inv = batch_invert(elems)
    for e, i in zip(elems, invs):
        assert e * i == Scalar.one()
    expected = Scalar.one()
    for i in invs:
        expected = expected * i
    assert prod_inv == expected


def test_bytes_roundtrip():
    rng = random.Random(3)
    for _ in range(20):
        a = Scalar.random(rng)
        assert Scalar.from_bytes(a.to_bytes()) == a
    assert len(Scalar(1).to_bytes()) == 48  # bls381 MODBYTES


def test_from_bytes_wide_buffer_reduction():
    """`FieldElement::from(&[u8; MODBYTES])` semantics (AUDIT.md #3,
    `transcript.rs:55-60`): a buffer WIDER than the scalar (bls381
    MODBYTES = 48 > 32 r-bytes) is interpreted big-endian and reduced
    mod r — the transcript challenge-reduction corner VERDICT r2 flagged."""
    from bulletproofs_tpu.config import BLS381, CURVES, using_curve
    buf48 = bytes(range(208, 256))                 # 48 bytes, top bits set
    v = int.from_bytes(buf48, "big")
    assert v > BLS381.r                            # reduction must happen
    assert Scalar.from_bytes(buf48).v == v % BLS381.r
    with using_curve(CURVES["bn254"]):
        buf32 = bytes(range(224, 256))             # bn254 MODBYTES = 32
        v32 = int.from_bytes(buf32, "big")
        assert Scalar.from_bytes(buf32).v == v32 % CURVES["bn254"].r
        assert len(Scalar(1).to_bytes()) == 32


def test_vandermonde_and_inner_product():
    x = Scalar(7)
    v = vandermonde_vector(x, 5)
    assert [e.v for e in v] == [1, 7, 49, 343, 2401]
    a = [Scalar(i) for i in (1, 2, 3)]
    b = [Scalar(i) for i in (4, 5, 6)]
    assert inner_product(a, b) == Scalar(32)


def test_bit_probing():
    a = Scalar(0b1011)
    assert a.is_odd()
    assert not a.shift_right(2).is_odd()
    assert a.shift_right(3) == Scalar(1)
