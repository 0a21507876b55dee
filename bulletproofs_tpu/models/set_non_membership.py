"""Set non-membership gadget
(`/root/reference/src/r1cs/gadgets/set_non_membership.rs`): commit each
difference set[i] - v and its inverse, prove every difference is non-zero."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import AllocatedQuantity
from ..transcript import ProofTranscript
from ..utils.errors import check_for_randomness_or_rng
from .helper_constraints import constrain_lc_with_scalar
from .helper_constraints.non_zero import is_nonzero_gadget


def set_non_membership_gadget(cs, v, diff_vars, diff_inv_vars, set_values):
    """`set_non_membership.rs:16-33`"""
    for i, s in enumerate(set_values):
        constrain_lc_with_scalar(cs, diff_vars[i].variable + v.variable, s)
        is_nonzero_gadget(cs, diff_vars[i].variable,
                          diff_inv_vars[i].variable)


def prove_set_non_membership(value: Scalar, randomness, set_values, rng,
                             prover: Prover):
    """`set_non_membership.rs:35-96`; returns
    [com_value, com_diff_0, com_diff_inv_0, ...]."""
    check_for_randomness_or_rng(randomness, rng)
    value = value if isinstance(value, Scalar) else Scalar(value)
    comms = []
    diff_vars = []
    diff_inv_vars = []

    com_value, var_value = prover.commit(
        value, randomness if randomness is not None else Scalar.random(rng))
    qty = AllocatedQuantity(var_value, value)
    comms.append(com_value)

    for s in set_values:
        diff = s - value
        diff_inv = diff.inverse()
        com_diff, var_diff = prover.commit(diff, Scalar.random(rng))
        diff_vars.append(AllocatedQuantity(var_diff, diff))
        comms.append(com_diff)
        com_inv, var_inv = prover.commit(diff_inv, Scalar.random(rng))
        diff_inv_vars.append(AllocatedQuantity(var_inv, diff_inv))
        comms.append(com_inv)

    set_non_membership_gadget(prover, qty, diff_vars, diff_inv_vars,
                              set_values)
    return comms


def verify_set_non_membership(set_values, commitments, verifier: Verifier):
    """`set_non_membership.rs:98-133`"""
    var_val = verifier.commit(commitments[0])
    qty = AllocatedQuantity(var_val)
    diff_vars = []
    diff_inv_vars = []
    for i in range(len(set_values)):
        diff_vars.append(
            AllocatedQuantity(verifier.commit(commitments[1 + 2 * i])))
        diff_inv_vars.append(
            AllocatedQuantity(verifier.commit(commitments[2 + 2 * i])))
    set_non_membership_gadget(verifier, qty, diff_vars, diff_inv_vars,
                              set_values)


def gen_proof_of_set_non_membership(value, randomness, set_values, rng,
                                    transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_set_non_membership(value, randomness, set_values, rng,
                                     prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_proof_of_set_non_membership(set_values, proof, commitments,
                                       transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_set_non_membership(set_values, commitments, verifier)
    verifier.verify(proof, g, h, G, H)
