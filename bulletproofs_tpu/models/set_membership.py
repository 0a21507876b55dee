"""Set membership gadget
(`/root/reference/src/r1cs/gadgets/set_membership.rs`): commit per-element
differences set[i] - v and prove their product is zero."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import (AllocatedQuantity, LinearCombination,
                                       Variable)
from ..transcript import ProofTranscript
from ..utils.errors import check_for_randomness_or_rng
from .helper_constraints import constrain_lc_with_scalar


def set_membership_gadget(cs, v, diff_vars, set_values):
    """prod(set[i] - v) == 0 with diff_vars[i] == set[i] - v
    (`set_membership.rs:15-37`)."""
    product = LinearCombination.from_var(Variable.one())
    for i, s in enumerate(set_values):
        constrain_lc_with_scalar(cs, diff_vars[i].variable + v.variable, s)
        _, _, o = cs.multiply(
            product, LinearCombination.from_var(diff_vars[i].variable))
        product = LinearCombination.from_var(o)
    cs.constrain(product)


def prove_set_membership(value: Scalar, randomness, set_values, rng,
                         prover: Prover):
    """`set_membership.rs:39-79`; returns [com_value, com_diff...]."""
    check_for_randomness_or_rng(randomness, rng)
    value = value if isinstance(value, Scalar) else Scalar(value)
    comms = []
    diff_vars = []

    com_value, var_value = prover.commit(
        value, randomness if randomness is not None else Scalar.random(rng))
    qty = AllocatedQuantity(var_value, value)
    comms.append(com_value)

    for s in set_values:
        diff = s - value
        com_diff, var_diff = prover.commit(diff, Scalar.random(rng))
        diff_vars.append(AllocatedQuantity(var_diff, diff))
        comms.append(com_diff)

    set_membership_gadget(prover, qty, diff_vars, set_values)
    return comms


def verify_set_membership(set_values, commitments, verifier: Verifier):
    """`set_membership.rs:81-108`"""
    var_val = verifier.commit(commitments[0])
    qty = AllocatedQuantity(var_val)
    diff_vars = [AllocatedQuantity(verifier.commit(c))
                 for c in commitments[1:len(set_values) + 1]]
    set_membership_gadget(verifier, qty, diff_vars, set_values)


def gen_proof_of_set_membership(value, randomness, set_values, rng,
                                transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_set_membership(value, randomness, set_values, rng, prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_proof_of_set_membership(set_values, proof, commitments,
                                   transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_set_membership(set_values, commitments, verifier)
    verifier.verify(proof, g, h, G, H)
