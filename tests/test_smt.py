"""Sparse Merkle tree tests: native tree semantics (mirroring
`helper_constraints/sparse_merkle_tree_4_ary.rs:383-438` /
`sparse_merkle_tree_8_ary.rs` tests) and leaf-inclusion proofs at a reduced
depth (the reference uses depth 12 / 8192 generators; depth 2 exercises every
code path with CI-sized circuits)."""

import pytest

from bulletproofs_tpu.models import (sparse_merkle_tree_4_ary as smt4,
                                     sparse_merkle_tree_8_ary as smt8)
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, SboxType)
from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_4_ary \
    import VanillaSparseMerkleTree_4, get_base_4_repr
from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_8_ary \
    import VanillaSparseMerkleTree_8, get_base_8_repr
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import InMemoryHashDb, get_generators


def test_base_repr():
    assert get_base_4_repr(Scalar(27), 4) == [0, 1, 2, 3]
    assert get_base_8_repr(Scalar(0o1723), 4) == [1, 7, 2, 3]


def test_vanilla_smt4_semantics(rng):
    params = PoseidonParams(5, 4, 4, 56)
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_4(params, 6, db)
    for i in range(1, 8):
        s = Scalar(i)
        tree.update(s, s, db)
    for i in range(1, 8):
        s = Scalar(i)
        assert tree.get(s, None, db) == s
        proof = []
        assert tree.get(s, proof, db) == s
        assert tree.verify_proof(s, s, proof)
        assert tree.verify_proof(s, s, proof, tree.root)
        assert not tree.verify_proof(s, s + Scalar(1), proof)


def test_vanilla_smt8_semantics(rng):
    params = PoseidonParams(9, 4, 4, 57)
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_8(params, 4, db)
    kvs = [(Scalar.random(rng), Scalar.random(rng)) for _ in range(5)]
    for k, v in kvs:
        tree.update(k, v, db)
    for k, v in kvs:
        assert tree.get(k, None, db) == v
        proof = []
        tree.get(k, proof, db)
        assert tree.verify_proof(k, v, proof)


@pytest.fixture(scope="module")
def gens():
    G = get_generators("G", 2048)
    H = get_generators("H", 2048)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    return g, h, G, H


def test_smt4_leaf_inclusion_proof(gens, rng):
    g, h, G, H = gens
    params = PoseidonParams(5, 4, 4, 56)
    depth = 2
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_4(params, depth, db)
    for i in range(1, 6):
        tree.update(Scalar(i), Scalar(100 + i), db)
    idx = Scalar(3)
    proof_nodes = []
    leaf = tree.get(idx, proof_nodes, db)
    assert leaf == Scalar(103)
    proof, comms = smt4.gen_proof_of_leaf_inclusion_4_ary_merkle_tree(
        leaf, idx, None, proof_nodes, tree.root, depth, params,
        SboxType.Quint, rng, b"SMT4", g, h, G, H)
    smt4.verify_proof_of_leaf_inclusion_4_ary_merkle_tree(
        tree.root, depth, params, SboxType.Quint, proof, comms, b"SMT4",
        g, h, G, H)


def test_smt8_leaf_inclusion_proof(gens, rng):
    g, h, G, H = gens
    params = PoseidonParams(9, 4, 4, 57)
    depth = 2
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_8(params, depth, db)
    for i in range(1, 6):
        tree.update(Scalar(i), Scalar(100 + i), db)
    idx = Scalar(5)
    proof_nodes = []
    leaf = tree.get(idx, proof_nodes, db)
    assert leaf == Scalar(105)
    proof, comms = smt8.gen_proof_of_leaf_inclusion_8_ary_merkle_tree(
        leaf, idx, None, proof_nodes, tree.root, depth, params,
        SboxType.Quint, rng, b"SMT8", g, h, G, H)
    smt8.verify_proof_of_leaf_inclusion_8_ary_merkle_tree(
        tree.root, depth, params, SboxType.Quint, proof, comms, b"SMT8",
        g, h, G, H)


def test_smt4_batch_update(rng):
    """batch_update must reach the same root as sequential updates (final
    leaf set determines all interior hashes) and serve valid proofs."""
    from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_4_ary \
        import VanillaSparseMerkleTree_4
    from bulletproofs_tpu.models.helper_constraints.poseidon import \
        PoseidonParams
    from bulletproofs_tpu.ops.field_host import Scalar
    from bulletproofs_tpu.utils.hash_db import InMemoryHashDb

    params = PoseidonParams(5, 4, 4, 56)
    depth = 4
    db_a = InMemoryHashDb()
    db_b = InMemoryHashDb()
    t_seq = VanillaSparseMerkleTree_4(params, depth, db_a)
    t_bat = VanillaSparseMerkleTree_4(params, depth, db_b)
    pairs = [(Scalar(i * 7 + 1), Scalar.random(rng)) for i in range(12)]
    pairs.append((pairs[3][0], Scalar.random(rng)))   # duplicate index
    for idx, val in pairs:
        t_seq.update(idx, val, db_a)
    root = t_bat.batch_update(pairs, db_b)
    assert root == t_seq.root
    # proofs from the batched tree verify
    idx, _ = pairs[5]
    proof = []
    got = t_bat.get(idx, proof, db_b)
    assert t_bat.verify_proof(idx, got, proof)


def test_smt8_batch_update(rng):
    from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_8_ary \
        import VanillaSparseMerkleTree_8
    from bulletproofs_tpu.models.helper_constraints.poseidon import \
        PoseidonParams
    from bulletproofs_tpu.ops.field_host import Scalar
    from bulletproofs_tpu.utils.hash_db import InMemoryHashDb

    params = PoseidonParams(9, 4, 4, 57)
    depth = 3
    db_a = InMemoryHashDb()
    db_b = InMemoryHashDb()
    t_seq = VanillaSparseMerkleTree_8(params, depth, db_a)
    t_bat = VanillaSparseMerkleTree_8(params, depth, db_b)
    pairs = [(Scalar(i * 5 + 2), Scalar.random(rng)) for i in range(10)]
    for idx, val in pairs:
        t_seq.update(idx, val, db_a)
    assert t_bat.batch_update(pairs, db_b) == t_seq.root


def test_smt4_depth12_gadget(rng):
    """Reference-scale depth-12 SMT-4 inclusion proof
    (`/root/reference/src/r1cs/gadgets/sparse_merkle_tree_4_ary.rs:242-251`
    uses depth 12 with 8192 generators).  Witness generation (tree build +
    updates) drives the batched device Poseidon; the proof itself runs on
    the native backend (VERDICT r2 task 9: must fit CI minutes)."""
    params = PoseidonParams(5, 4, 4, 56)
    depth = 12
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_4(params, depth, db)
    pairs = [(Scalar(i * 129 + 1), Scalar(200 + i)) for i in range(24)]
    tree.batch_update(pairs, db)

    idx = Scalar(5 * 129 + 1)
    proof_nodes = []
    leaf = tree.get(idx, proof_nodes, db)
    assert leaf == Scalar(205)

    G = get_generators("G", 8192)
    H = get_generators("H", 8192)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    proof, comms = smt4.gen_proof_of_leaf_inclusion_4_ary_merkle_tree(
        leaf, idx, None, proof_nodes, tree.root, depth, params,
        SboxType.Quint, rng, b"SMT4d12", g, h, G, H)
    smt4.verify_proof_of_leaf_inclusion_4_ary_merkle_tree(
        tree.root, depth, params, SboxType.Quint, proof, comms, b"SMT4d12",
        g, h, G, H)
