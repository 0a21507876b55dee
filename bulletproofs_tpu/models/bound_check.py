"""Bound-check (range proof) gadget (`/root/reference/src/r1cs/gadgets/bound_check.rs`).

Proves a committed v lies in [min, max]: with a = v - min, b = max - v,
constrain a + b = max - min and a, b in [0, 2^n).  This is the range-proof
entry point of the framework (the reference has no separate range-proof
module; BASELINE config #1/#2 run through here).

Gadget convention (reference `gadgets/README.md:1-5`):
 - `*_gadget`: pure constraint builder over any ConstraintSystem
 - `prove_*` / `verify_*`: composable, take a live Prover/Verifier
 - `gen_proof_*` / `verify_proof_*`: one-shot, own the transcript
"""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import AllocatedQuantity
from ..transcript import ProofTranscript
from ..utils.errors import check_for_randomness_or_rng
from .helper_constraints import constrain_lc_with_scalar
from .helper_constraints.positive_no import positive_no_gadget


def bound_check_gadget(cs, v, a, b, max_val: int, min_val: int, n: int):
    """`bound_check.rs:13-39`"""
    # v - min - a == 0
    cs.constrain(v.variable - Scalar(min_val) - a.variable)
    # max - v - b == 0
    cs.constrain(Scalar(max_val) - v.variable - b.variable)
    # a + b == max - min
    constrain_lc_with_scalar(cs, a.variable + b.variable,
                             Scalar(max_val - min_val))
    # a, b in [0, 2^n)
    positive_no_gadget(cs, a, n)
    positive_no_gadget(cs, b, n)


def prove_bounded_num(val: int, randomness, lower: int, upper: int,
                      max_bits_in_val: int, rng, prover: Prover):
    """`bound_check.rs:41-92`; returns the three V commitments."""
    check_for_randomness_or_rng(randomness, rng)
    a = val - lower
    b = upper - val

    # blindings drawn in the same rng order as sequential commits
    # (commit itself never touches the rng), then all three Pedersen
    # commitments ride one batched fold — proof bytes unchanged
    r_v = randomness if randomness is not None else Scalar.random(rng)
    r_a = Scalar.random(rng)
    r_b = Scalar.random(rng)
    (com_v, var_v), (com_a, var_a), (com_b, var_b) = prover.commit_many(
        [Scalar(val), Scalar(a), Scalar(b)], [r_v, r_a, r_b])
    qty_v = AllocatedQuantity(var_v, Scalar(val))
    qty_a = AllocatedQuantity(var_a, Scalar(a))
    qty_b = AllocatedQuantity(var_b, Scalar(b))
    comms = [com_v, com_a, com_b]

    bound_check_gadget(prover, qty_v, qty_a, qty_b, upper, lower,
                       max_bits_in_val)
    return comms


def verify_bounded_num(lower: int, upper: int, max_bits_in_val: int,
                       commitments, verifier: Verifier):
    """`bound_check.rs:94-129`"""
    var_v = verifier.commit(commitments[0])
    var_a = verifier.commit(commitments[1])
    var_b = verifier.commit(commitments[2])
    bound_check_gadget(verifier,
                       AllocatedQuantity(var_v), AllocatedQuantity(var_a),
                       AllocatedQuantity(var_b), upper, lower,
                       max_bits_in_val)


def gen_proof_of_bounded_num(val, randomness, lower, upper, max_bits_in_val,
                             rng, transcript_label: bytes, g, h, G, H):
    """One-shot prover (`bound_check.rs:133-161`)."""
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_bounded_num(val, randomness, lower, upper, max_bits_in_val,
                              rng, prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_proof_of_bounded_num(lower, upper, max_bits_in_val, proof,
                                commitments, transcript_label: bytes,
                                g, h, G, H):
    """One-shot verifier (`bound_check.rs:163-179`)."""
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_bounded_num(lower, upper, max_bits_in_val, commitments, verifier)
    verifier.verify(proof, g, h, G, H)
