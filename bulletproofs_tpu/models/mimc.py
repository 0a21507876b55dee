"""MiMC preimage-knowledge gadget
(`/root/reference/src/r1cs/gadgets/mimc.rs`): prove knowledge of committed
(xl, xr) with MiMC(xl, xr) == public image."""

from ..ops.field_host import Scalar
from ..r1cs import Prover, Verifier
from ..r1cs.linear_combination import AllocatedQuantity
from ..transcript import ProofTranscript
from ..utils.errors import (check_for_input_and_randomness_length,
                            check_for_randomness_or_rng)
from .helper_constraints.mimc import mimc, mimc_gadget


def prove_mimc_preimage(inputs, randomness, expected_output: Scalar,
                        constants, mimc_rounds: int, rng, prover: Prover):
    """`mimc.rs:12-57`; returns [com_l, com_r]."""
    check_for_randomness_or_rng(randomness, rng)
    rands = randomness if randomness is not None else \
        [Scalar.random(rng), Scalar.random(rng)]
    check_for_input_and_randomness_length(inputs, rands, 2)

    com_l, var_l = prover.commit(inputs[0], rands[0])
    com_r, var_r = prover.commit(inputs[1], rands[1])
    left = AllocatedQuantity(var_l, inputs[0])
    right = AllocatedQuantity(var_r, inputs[1])
    mimc_gadget(prover, left, right, mimc_rounds, constants, expected_output)
    return [com_l, com_r]


def verify_mimc_preimage(expected_output: Scalar, constants, mimc_rounds: int,
                         commitments, verifier: Verifier):
    """`mimc.rs:59-89`"""
    var_l = verifier.commit(commitments[0])
    var_r = verifier.commit(commitments[1])
    mimc_gadget(verifier, AllocatedQuantity(var_l), AllocatedQuantity(var_r),
                mimc_rounds, constants, expected_output)


def gen_proof_of_knowledge_of_preimage_of_mimc(
        inputs, randomness, expected_output, constants, mimc_rounds, rng,
        transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    prover = Prover(g, h, transcript, rng=rng)
    comms = prove_mimc_preimage(inputs, randomness, expected_output,
                                constants, mimc_rounds, rng, prover)
    proof = prover.prove(G, H)
    return proof, comms


def verify_knowledge_of_preimage_of_mimc(
        expected_output, constants, mimc_rounds, proof, commitments,
        transcript_label: bytes, g, h, G, H):
    transcript = ProofTranscript(transcript_label)
    verifier = Verifier(transcript)
    verify_mimc_preimage(expected_output, constants, mimc_rounds,
                         commitments, verifier)
    verifier.verify(proof, g, h, G, H)
