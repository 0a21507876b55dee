"""Set membership, one-of-n bitmap variant
(`/root/reference/src/r1cs/gadgets/set_membership_alt.rs`): commit a bitmap
with a single 1 at the value's index; prove each entry is a bit, the bits sum
to 1, and set[i]*bit[i] == bit[i]*value."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import (AllocatedQuantity, LinearCombination,
                                       Variable)
from ..transcript import ProofTranscript
from ..utils.errors import check_for_randomness_or_rng
from .helper_constraints import constrain_lc_with_scalar
from .helper_constraints.bit import bit_gadget
from .helper_constraints.vector_sum import vector_sum_constraints


def vector_product_gadget(cs, items, bit_allocs, value):
    """set[i] * bit[i] == bit[i] * value, and sum of products == value
    (`set_membership_alt.rs:56-88`)."""
    terms = [(value.variable, Scalar.minus_one())]
    for i, item in enumerate(items):
        assignment = None
        if bit_allocs[i].assignment is not None:
            assignment = (bit_allocs[i].assignment, Scalar(item))
        bit_var, item_var, o1 = cs.allocate_multiplier(assignment)
        constrain_lc_with_scalar(cs, LinearCombination.from_var(item_var),
                                 Scalar(item))
        _, _, o2 = cs.multiply(LinearCombination.from_var(bit_var),
                               LinearCombination.from_var(value.variable))
        cs.constrain(o1 - o2)
        terms.append((o1, Scalar.one()))
    cs.constrain(LinearCombination(terms))


def prove_set_membership_alt(value: int, randomness, set_values, rng,
                             prover: Prover):
    """`set_membership_alt.rs:90-138`; returns [bit comms..., com_value]."""
    check_for_randomness_or_rng(randomness, rng)
    bit_map = [1 if elem == value else 0 for elem in set_values]

    comms = []
    bit_vars = []
    bit_allocs = []
    for b in bit_map:
        bs = Scalar(b)
        com, var = prover.commit(bs, Scalar.random(rng))
        bit_vars.append(var)
        qty = AllocatedQuantity(var, bs)
        bit_gadget(prover, qty)
        comms.append(com)
        bit_allocs.append(qty)

    vector_sum_constraints(prover, bit_vars, 1)

    vs = Scalar(value)
    com_value, var_value = prover.commit(
        vs, randomness if randomness is not None else Scalar.random(rng))
    qty_value = AllocatedQuantity(var_value, vs)
    vector_product_gadget(prover, set_values, bit_allocs, qty_value)
    comms.append(com_value)
    return comms


def verify_set_membership_alt(set_values, commitments, verifier: Verifier):
    """`set_membership_alt.rs:141-174`"""
    bit_vars = []
    bit_allocs = []
    for i in range(len(set_values)):
        var = verifier.commit(commitments[i])
        bit_vars.append(var)
        qty = AllocatedQuantity(var)
        bit_gadget(verifier, qty)
        bit_allocs.append(qty)

    vector_sum_constraints(verifier, bit_vars, 1)

    var_val = verifier.commit(commitments[len(set_values)])
    vector_product_gadget(verifier, set_values, bit_allocs,
                          AllocatedQuantity(var_val))


def gen_proof_of_set_membership_alt(value, randomness, set_values, rng,
                                    transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_set_membership_alt(value, randomness, set_values, rng,
                                     prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_proof_of_set_membership_alt(set_values, proof, commitments,
                                       transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_set_membership_alt(set_values, commitments, verifier)
    verifier.verify(proof, g, h, G, H)
