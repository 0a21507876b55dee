"""Randomizer gadget round trip (`randomizer.rs:345-490` uses depth-8 trees
and 65536 generators; depth 1 with one modified index exercises the full
prove-inclusion + replay-updates circuit at CI size)."""

from bulletproofs_tpu.models import randomizer as rz
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, SboxType)
from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_4_ary \
    import VanillaSparseMerkleTree_4
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import InMemoryHashDb, get_generators


def test_indices_derivation():
    nonce = Scalar(12345)
    idx = rz.get_indices_to_modify(nonce, 16, 3)
    assert len(idx) <= 3
    assert all(0 <= int(i) < 16 for i in idx)
    # deterministic
    assert idx == rz.get_indices_to_modify(nonce, 16, 3)


def test_randomizer_proof(rng):
    depth = 1
    data_size = 4
    params = PoseidonParams(5, 4, 4, 56)
    sbox = SboxType.Quint

    data = [Scalar(10 + i) for i in range(data_size)]
    indices = rz.get_indices_to_modify(Scalar(777), data_size, 1)
    modified, new_data = rz.get_randomized_data(data, indices)

    orig_db, new_db = InMemoryHashDb(), InMemoryHashDb()
    orig_tree = VanillaSparseMerkleTree_4(params, depth, orig_db)
    new_tree = VanillaSparseMerkleTree_4(params, depth, new_db)
    for i in range(data_size):
        orig_tree.update(Scalar(i), data[i], orig_db)
        new_tree.update(Scalar(i), new_data[i], new_db)

    mod_idx = sorted(modified, key=int)
    orig_vals = [modified[i] for i in mod_idx]

    G = get_generators("G", 2048)
    H = get_generators("H", 2048)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")

    proof, comms = rz.gen_proof_for_randomizer(
        orig_tree, orig_db, new_tree, new_db, mod_idx, orig_vals, depth,
        params, sbox, b"Randomizer", g, h, G, H, rng=rng)
    rz.verify_proof_for_randomizer(
        new_tree, new_db, mod_idx, depth, params, sbox, proof, comms,
        b"Randomizer", g, h, G, H)
