"""Randomizer gadget (`/root/reference/src/r1cs/gadgets/randomizer.rs`):
prove two 4-ary Merkle trees differ only at nonce-derived indices — the
original values are proven under the (hidden, committed) original root, and
the circuit replays the updates on the new tree until its root equals that
original root."""

import hashlib

from ..config import curve
from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import LinearCombination
from ..transcript import ProofTranscript
from .helper_constraints.poseidon import Poseidon_hash_4_constraints
from .helper_constraints.sparse_merkle_tree_4_ary import (
    VanillaSparseMerkleTree_4)
from .poseidon_hash import (allocate_statics_for_prover,
                            allocate_statics_for_verifier)


def randomize(x: Scalar) -> Scalar:
    """Hash to get a new number (`randomizer.rs:35-37`)."""
    return Scalar.from_msg_hash(x.to_bytes())


def get_indices_to_modify(nonce: Scalar, data_size: int,
                          count_modified: int):
    """`count_modified` SHAKE256-derived indices in [0, data_size)
    (`randomizer.rs:40-65`); may return fewer on (unlikely) collisions, same
    as the reference."""
    target_byte_size = 2 * count_modified * curve().modbytes
    target = hashlib.shake_256(nonce.to_bytes()).digest(target_byte_size)
    mb = curve().modbytes
    indices = set()
    off = 0
    while len(indices) < count_modified and len(target) - off >= mb:
        n = int.from_bytes(target[off:off + mb], "big") % curve().r
        off += mb
        indices.add(Scalar(n % data_size))
    return indices


def get_randomized_data(original_data, indices):
    """`randomizer.rs:67-84`: returns ({index: original value}, new data)."""
    modified = {}
    new_data = list(original_data)
    for idx in sorted(indices, key=int):
        i = int(idx)
        modified[idx] = new_data[i]
        new_data[i] = randomize(new_data[i])
    return modified, new_data


def randomizer_gadget(cs, depth: int, orig_root, new_tree, new_db, indices,
                      orig_vals, orig_vals_proofs, statics, poseidon_params,
                      sbox_type):
    """`randomizer.rs:87-198`"""
    assert new_tree.depth == depth
    assert len(indices) == len(orig_vals)
    statics = [LinearCombination.coerce(s) for s in statics]

    # path prefix (tuple of digits) -> LC of that node in the new tree
    modified_nodes = {(): LinearCombination.coerce(new_tree.root)}

    for idx, orig_val, proof_vars in zip(indices, orig_vals,
                                         orig_vals_proofs):
        path_for_get = VanillaSparseMerkleTree_4.leaf_index_to_path(
            idx, depth)
        path_for_update = list(reversed(path_for_get))
        proof_vars = list(proof_vars)

        # prove idx has value orig_val under orig_root
        cur_hash = LinearCombination.from_var(orig_val)
        for pos in path_for_update:
            level = [LinearCombination.from_var(proof_vars.pop())
                     for _ in range(3)]
            level.reverse()
            level.insert(pos, cur_hash)
            cur_hash = Poseidon_hash_4_constraints(
                cs, level, statics, poseidon_params, sbox_type)
        cs.constrain(cur_hash - orig_root)

        # record all siblings along idx's path in the new tree
        cur_node = new_tree.root
        cur_prefix = ()
        for pos in path_for_get:
            children = new_db.get(cur_node.to_bytes())
            cur_node = children[pos]
            for k, c in enumerate(children):
                key = cur_prefix + (k,)
                if key not in modified_nodes:
                    modified_nodes[key] = LinearCombination.coerce(c)
            cur_prefix = cur_prefix + (pos,)

    # replay the updates inside the circuit, leaf to root
    for idx, orig_val in zip(indices, orig_vals):
        path = VanillaSparseMerkleTree_4.leaf_index_to_path(idx, depth)
        val_lc = LinearCombination.from_var(orig_val)
        for j in range(depth - 1, -1, -1):
            level = []
            for k in range(4):
                if path[j] != k:
                    level.append(modified_nodes[tuple(
                        path[:j] + [k] + path[j + 1:])])
            level.insert(path[j], val_lc)
            if j == depth - 1:
                modified_nodes[tuple(path)] = val_lc
            val_lc = Poseidon_hash_4_constraints(
                cs, level, statics, poseidon_params, sbox_type)
            path = path[:j]
            modified_nodes[tuple(path)] = val_lc

    cs.constrain(modified_nodes[()] - orig_root)


def gen_proof_for_randomizer(orig_tree, orig_db, new_tree, new_db,
                             modified_indices, orig_vals, tree_depth,
                             hash_params, sbox_type, transcript_label: bytes,
                             g, h, G, H, rng=None):
    """`randomizer.rs:201-283`"""
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = []

    com_root, var_root = prover.commit(orig_tree.root, Scalar.random(rng))
    comms.append(com_root)

    orig_val_vars = []
    proof_vars = []
    for idx, expect in zip(modified_indices, orig_vals):
        merkle_proof = []
        v = orig_tree.get(idx, merkle_proof, orig_db)
        assert v == expect
        com, var = prover.commit(v, Scalar.random(rng))
        comms.append(com)
        orig_val_vars.append(var)
        ps = []
        for node in merkle_proof:
            for elem in node:
                c, pv = prover.commit(elem, Scalar.random(rng))
                comms.append(c)
                ps.append(pv)
        proof_vars.append(ps)

    statics = allocate_statics_for_prover(prover, 1)
    randomizer_gadget(prover, tree_depth, var_root, new_tree, new_db,
                      list(modified_indices), orig_val_vars, proof_vars,
                      statics, hash_params, sbox_type)
    return prover.prove(G, H), comms


def verify_proof_for_randomizer(new_tree, new_db, modified_indices,
                                tree_depth, hash_params, sbox_type, proof,
                                commitments, transcript_label: bytes,
                                g, h, G, H):
    """`randomizer.rs:286-343`"""
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    pos = 0
    var_root = verifier.commit(commitments[pos])
    pos += 1

    orig_val_vars = []
    proof_vars = []
    for _ in modified_indices:
        orig_val_vars.append(verifier.commit(commitments[pos]))
        pos += 1
        ps = []
        for _ in range(tree_depth * 3):
            ps.append(verifier.commit(commitments[pos]))
            pos += 1
        proof_vars.append(ps)

    statics = allocate_statics_for_verifier(verifier, 1, g, h)
    randomizer_gadget(verifier, tree_depth, var_root, new_tree, new_db,
                      list(modified_indices), orig_val_vars, proof_vars,
                      statics, hash_params, sbox_type)
    verifier.verify(proof, g, h, G, H)
