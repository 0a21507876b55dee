"""Poseidon permutation + preimage gadget tests, mirroring the reference's
per-width tests (`poseidon_hash.rs:501-745`) with the same round parameters
(full=4+4; partial=55/56/57 for widths 3/5/9)."""

import pytest

from bulletproofs_tpu.config import BN254, using_curve
from bulletproofs_tpu.models import poseidon_hash as ph
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, Poseidon_hash_2, Poseidon_hash_4, Poseidon_hash_8,
    Poseidon_permutation, SboxType)
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import VerificationError, get_generators


@pytest.fixture(scope="module")
def gens():
    G = get_generators("G", 2048)
    H = get_generators("H", 2048)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    return g, h, G, H


def params_2():
    return PoseidonParams(3, 4, 4, 55)


def test_permutation_native(rng):
    p = params_2()
    inp = [Scalar.random(rng) for _ in range(3)]
    out = Poseidon_permutation(inp, p, SboxType.Cube)
    assert len(out) == 3
    # deterministic
    assert out == Poseidon_permutation(inp, p, SboxType.Cube)
    # quint & inverse work natively too
    Poseidon_permutation(inp, p, SboxType.Quint)
    Poseidon_permutation(inp, p, SboxType.Inverse)


def test_constants_differ_per_curve(rng):
    p_bls = params_2()
    with using_curve(BN254):
        p_bn = params_2()
    assert p_bls.round_keys[0] != p_bn.round_keys[0]


@pytest.mark.parametrize("sbox", [SboxType.Cube, SboxType.Quint,
                                  SboxType.Inverse])
def test_poseidon_hash_2(gens, rng, sbox):
    g, h, G, H = gens
    p = params_2()
    xl, xr = Scalar.random(rng), Scalar.random(rng)
    image = Poseidon_hash_2(xl, xr, p, sbox)
    proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_2(
        [xl, xr], None, image, p, sbox, rng, b"Poseidon2", g, h, G, H)
    ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_2(
        image, p, sbox, proof, comms, b"Poseidon2", g, h, G, H)


def test_poseidon_hash_2_wrong_image_fails(gens, rng):
    g, h, G, H = gens
    p = params_2()
    xl, xr = Scalar.random(rng), Scalar.random(rng)
    image = Poseidon_hash_2(xl, xr, p, SboxType.Cube)
    proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_2(
        [xl, xr], None, image, p, SboxType.Cube, rng, b"Poseidon2",
        g, h, G, H)
    with pytest.raises(VerificationError):
        ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_2(
            image + Scalar(1), p, SboxType.Cube, proof, comms, b"Poseidon2",
            g, h, G, H)


def test_poseidon_hash_4(gens, rng):
    g, h, G, H = gens
    p = PoseidonParams(5, 4, 4, 56)
    inputs = [Scalar.random(rng) for _ in range(4)]
    image = Poseidon_hash_4(inputs, p, SboxType.Cube)
    proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_4(
        inputs, None, image, p, SboxType.Cube, rng, b"Poseidon4", g, h, G, H)
    ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_4(
        image, p, SboxType.Cube, proof, comms, b"Poseidon4", g, h, G, H)


def test_poseidon_hash_8(gens, rng):
    g, h, G, H = gens
    p = PoseidonParams(9, 4, 4, 57)
    inputs = [Scalar.random(rng) for _ in range(8)]
    image = Poseidon_hash_8(inputs, p, SboxType.Cube)
    proof, comms = ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_8(
        inputs, None, image, p, SboxType.Cube, rng, b"Poseidon8", g, h, G, H)
    ph.verify_proof_of_knowledge_of_preimage_of_Poseidon_8(
        image, p, SboxType.Cube, proof, comms, b"Poseidon8", g, h, G, H)


def test_poseidon_device_batch(rng):
    """Batched device Poseidon permutation (ops/poseidon_device.py) vs the
    host scalar path, bit-exact, Cube + Quint s-boxes."""
    from bulletproofs_tpu.ops import poseidon_device as pd
    from bulletproofs_tpu.ops.field_host import Scalar
    from bulletproofs_tpu.models.helper_constraints.poseidon import (
        PoseidonParams, Poseidon_hash_2, Poseidon_permutation, SboxType)

    params = PoseidonParams(3, 4, 4, 55)
    n = 6
    cols = [[Scalar.random(rng) for _ in range(n)] for _ in range(3)]
    for sbox in (SboxType.Cube, SboxType.Quint):
        got = pd.poseidon_permutation_batch(cols, params, sbox)
        for j in range(n):
            want = Poseidon_permutation([cols[i][j] for i in range(3)],
                                        params, sbox)
            assert [got[i][j].v for i in range(3)] == [s.v for s in want]

    xl = [Scalar.random(rng) for _ in range(4)]
    xr = [Scalar.random(rng) for _ in range(4)]
    got2 = pd.poseidon_hash_2_batch(xl, xr, params, SboxType.Cube)
    for j in range(4):
        assert got2[j].v == Poseidon_hash_2(
            xl[j], xr[j], params, SboxType.Cube).v
