"""Hamming-distance gadget
(`/root/reference/src/r1cs/gadgets/hamming_distance.rs`): prove that two
ordered sets (one committed, one public) differ in exactly `count_different`
positions.  Per element: 1_or_0 = diff * diff_inv with diff*(1-1_or_0) = 0,
then sum(1_or_0) == count."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import (AllocatedQuantity, LinearCombination,
                                       Variable)
from ..transcript import ProofTranscript
from ..utils.errors import GadgetError
from .helper_constraints.vector_sum import vector_sum_constraints


def hamming_distance_gadget(cs, original, new_vals, count_different: int):
    """`hamming_distance.rs:17-56`"""
    if len(original) != len(new_vals):
        raise GadgetError("Original and new are of different lengths")
    result = []
    for alloc, new in zip(original, new_vals):
        diff = alloc.variable - new
        val_diff = cs.evaluate_lc(diff)
        # amcl convention: inverse(0) == 0, making 1_or_0 an indicator
        val_diff_inv = None
        if val_diff is not None:
            val_diff_inv = Scalar.zero() if val_diff.is_zero() \
                else val_diff.inverse()

        var_diff, _ = cs.allocate_single(val_diff)
        _, var_o = cs.allocate_single(val_diff_inv)

        # diff * (1 - 1_or_0) = 0
        _, _, o = cs.multiply(LinearCombination.from_var(var_diff),
                              Variable.one() - var_o)
        cs.constrain(LinearCombination.from_var(o))
        result.append(var_o)

    vector_sum_constraints(cs, result, count_different)


def prove_hamming_distance(original_vals, new_vals, count_different: int,
                           prover: Prover, rng=None):
    """`hamming_distance.rs:58-84`"""
    if len(original_vals) != len(new_vals):
        raise GadgetError("Original and new are of different lengths")
    comms, allocs = [], []
    for v in original_vals:
        com, var = prover.commit(v, Scalar.random(rng))
        comms.append(com)
        allocs.append(AllocatedQuantity(var, v))
    hamming_distance_gadget(prover, allocs, new_vals, count_different)
    return comms


def verify_hamming_distance(new_vals, count_different: int, commitments,
                            verifier: Verifier):
    """`hamming_distance.rs:86-106`"""
    allocs = [AllocatedQuantity(verifier.commit(c)) for c in commitments]
    hamming_distance_gadget(verifier, allocs, new_vals, count_different)


def gen_proof_for_hamming_distance(original_vals, new_vals, count_different,
                                   transcript_label: bytes, g, h, G, H,
                                   rng=None):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_hamming_distance(original_vals, new_vals, count_different,
                                   prover, rng)
    return prover.prove(G, H), comms


def verify_proof_for_hamming_distance(new_vals, count_different, proof,
                                      commitments, transcript_label: bytes,
                                      g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_hamming_distance(new_vals, count_different, commitments, verifier)
    verifier.verify(proof, g, h, G, H)
