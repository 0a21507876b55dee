"""Non-zero value gadget (`/root/reference/src/r1cs/gadgets/non_zero.rs`):
prove a committed value is != 0 by also committing its inverse."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier

from ..transcript import ProofTranscript
from ..utils.errors import check_for_randomness_or_rng
from .helper_constraints.non_zero import is_nonzero_gadget


def prove_non_zero_val(value: Scalar, randomness, rng, prover: Prover):
    """`non_zero.rs:11-52`; returns [com_val, com_val_inv]."""
    check_for_randomness_or_rng(randomness, rng)
    value = value if isinstance(value, Scalar) else Scalar(value)
    inv = value.inverse()
    comms = []

    com_val, var_val = prover.commit(
        value, randomness if randomness is not None else Scalar.random(rng))
    comms.append(com_val)
    com_inv, var_inv = prover.commit(inv, Scalar.random(rng))
    comms.append(com_inv)

    is_nonzero_gadget(prover, var_val, var_inv)
    return comms


def verify_non_zero_val(commitments, verifier: Verifier):
    """`non_zero.rs:54-73`"""
    var_val = verifier.commit(commitments[0])
    var_inv = verifier.commit(commitments[1])
    is_nonzero_gadget(verifier, var_val, var_inv)


def gen_proof_of_non_zero_val(value, randomness, rng, transcript_label: bytes,
                              g, h, G, H):
    """One-shot prover (`non_zero.rs:77-93`)."""
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_non_zero_val(value, randomness, rng, prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_proof_of_non_zero_val(proof, commitments, transcript_label: bytes,
                                 g, h, G, H):
    """One-shot verifier (`non_zero.rs:95-109`)."""
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_non_zero_val(commitments, verifier)
    verifier.verify(proof, g, h, G, H)
