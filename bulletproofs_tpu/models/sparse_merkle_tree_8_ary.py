"""8-ary sparse Merkle tree leaf-inclusion gadget
(`/root/reference/src/r1cs/gadgets/sparse_merkle_tree_8_ary.rs`): commit the
leaf, leaf index and 7 proof nodes per level; the single static is the
zero-blinding ZERO commitment (`sparse_merkle_tree_8_ary.rs:72,113`)."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import AllocatedQuantity
from ..transcript import ProofTranscript
from ..utils.errors import GadgetError, check_for_randomness_or_rng
from .helper_constraints.sparse_merkle_tree_8_ary import (
    vanilla_merkle_merkle_tree_8_verif_gadget)
from .poseidon_hash import (allocate_statics_for_prover,
                            allocate_statics_for_verifier)


def prove_leaf_inclusion_8_ary_merkle_tree(
        leaf: Scalar, leaf_index: Scalar, randomness, merkle_proof,
        root: Scalar, tree_depth: int, hash_params, sbox_type, rng,
        prover: Prover):
    """`sparse_merkle_tree_8_ary.rs:22-87`"""
    check_for_randomness_or_rng(randomness, rng)
    rands = randomness if randomness is not None else \
        [Scalar.random(rng), Scalar.random(rng)]
    if len(rands) != 2:
        raise GadgetError("Provided randomness should have size 2")

    comms = []
    com_leaf, var_leaf = prover.commit(leaf, rands[0])
    comms.append(com_leaf)
    com_idx, var_idx = prover.commit(leaf_index, rands[1])
    idx_alloc = AllocatedQuantity(var_idx, leaf_index)
    comms.append(com_idx)

    proof_vars = []
    for node in merkle_proof:
        for elem in node:
            c, v = prover.commit(elem, Scalar.random(rng))
            comms.append(c)
            proof_vars.append(v)

    zero = allocate_statics_for_prover(prover, 1)[0]
    vanilla_merkle_merkle_tree_8_verif_gadget(
        prover, tree_depth, root, var_leaf, idx_alloc, proof_vars, zero,
        hash_params, sbox_type)
    return comms


def verify_leaf_inclusion_8_ary_merkle_tree(
        root: Scalar, tree_depth: int, hash_params, sbox_type, commitments,
        g, h, verifier: Verifier):
    """`sparse_merkle_tree_8_ary.rs:89-128`"""
    var_leaf = verifier.commit(commitments[0])
    var_idx = verifier.commit(commitments[1])
    proof_vars = [verifier.commit(c) for c in commitments[2:]]
    zero = allocate_statics_for_verifier(verifier, 1, g, h)[0]
    vanilla_merkle_merkle_tree_8_verif_gadget(
        verifier, tree_depth, root, var_leaf, AllocatedQuantity(var_idx),
        proof_vars, zero, hash_params, sbox_type)


def gen_proof_of_leaf_inclusion_8_ary_merkle_tree(
        leaf, leaf_index, randomness, merkle_proof, root, tree_depth,
        hash_params, sbox_type, rng, transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_leaf_inclusion_8_ary_merkle_tree(
        leaf, leaf_index, randomness, merkle_proof, root, tree_depth,
        hash_params, sbox_type, rng, prover)
    return prover.prove(G, H), comms


def verify_proof_of_leaf_inclusion_8_ary_merkle_tree(
        root, tree_depth, hash_params, sbox_type, proof, commitments,
        transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_leaf_inclusion_8_ary_merkle_tree(
        root, tree_depth, hash_params, sbox_type, commitments, g, h, verifier)
    verifier.verify(proof, g, h, G, H)
