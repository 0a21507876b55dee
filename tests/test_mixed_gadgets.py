"""Mixed-gadget composition + 2-phase randomized constraints.

- test_combination_of_bound_check_and_set_membership mirrors
  `/root/reference/tests/multiple_constraint_systems.rs:98-174`: a bound
  check, a set membership and a set non-membership proved in ONE R1CS proof
  (one prover, one transcript) — the heterogeneous aggregation contract.
- test_two_phase_shuffle exercises `specify_randomized_constraints`
  (`/root/reference/src/r1cs/constraint_system.rs:118-136`): a 2-shuffle
  proof whose constraints depend on a phase-2 challenge, so the
  r1cs-2phase transcript branch (`transcript.rs:43-45`) executes on both
  prover and verifier, including phase-2 witness commitments (A_I2/A_O2/S2).
"""

import pytest

from bulletproofs_tpu import Prover, Verifier
from bulletproofs_tpu.models import (bound_check, set_membership,
                                     set_non_membership)
from bulletproofs_tpu.ops.ec_host import G1, commit_to_field_element
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.r1cs.linear_combination import LinearCombination
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.utils.errors import VerificationError


def test_combination_of_bound_check_and_set_membership(rng):
    """`multiple_constraint_systems.rs:98-174` (max_bits reduced for CI)."""
    max_bits_in_val = 16
    lo, hi, v = 39, 545, 419

    the_set = [Scalar(x) for x in (2, 97, 125, 307, 500, 950, 2099)]
    present_value = Scalar(125)
    absent_value = Scalar(10)

    G = get_generators("G", 128)
    H = get_generators("H", 128)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    label = b"Combination"

    tr = ProofTranscript(label)
    prover = Prover(g, h, tr)
    comms_1 = bound_check.prove_bounded_num(
        v, None, lo, hi, max_bits_in_val, rng, prover)
    comms_2 = set_membership.prove_set_membership(
        present_value, None, the_set, rng, prover)
    comms_3 = set_non_membership.prove_set_non_membership(
        absent_value, None, the_set, rng, prover)
    proof = prover.prove(G, H)

    tr_v = ProofTranscript(label)
    verifier = Verifier(tr_v)
    bound_check.verify_bounded_num(lo, hi, max_bits_in_val, comms_1, verifier)
    set_membership.verify_set_membership(the_set, comms_2, verifier)
    set_non_membership.verify_set_non_membership(the_set, comms_3, verifier)
    verifier.verify(proof, g, h, G, H)

    # tampered ordering must fail: verifying the gadgets in a different order
    # changes the constraint schedule and the transcript
    tr_bad = ProofTranscript(label)
    verifier_bad = Verifier(tr_bad)
    set_membership.verify_set_membership(the_set, comms_2, verifier_bad)
    bound_check.verify_bounded_num(lo, hi, max_bits_in_val, comms_1,
                                   verifier_bad)
    set_non_membership.verify_set_non_membership(the_set, comms_3,
                                                 verifier_bad)
    with pytest.raises(VerificationError):
        verifier_bad.verify(proof, g, h, G, H)


def _shuffle_gadget(cs, x_vars, y_vars):
    """2-shuffle: {x0, x1} == {y0, y1} as multisets, via the phase-2
    challenge z and (x0-z)(x1-z) == (y0-z)(y1-z).  The deferred callback is
    the canonical use of `specify_randomized_constraints`
    (`constraint_system.rs:60-136`)."""
    x0, x1 = x_vars
    y0, y1 = y_vars

    def randomized(rcs):
        z = rcs.challenge_scalar(b"shuffle_z")
        _, _, ox = rcs.multiply(x0 - z, x1 - z)
        _, _, oy = rcs.multiply(y0 - z, y1 - z)
        rcs.constrain(LinearCombination.from_var(ox) - oy)

    cs.specify_randomized_constraints(randomized)


def _prove_shuffle(xs, ys, rng, label, g, h, G, H):
    tr = ProofTranscript(label)
    prover = Prover(g, h, tr)
    comms, x_vars, y_vars = [], [], []
    for v in xs:
        com, var = prover.commit(v, Scalar.random(rng))
        comms.append(com)
        x_vars.append(var)
    for v in ys:
        com, var = prover.commit(v, Scalar.random(rng))
        comms.append(com)
        y_vars.append(var)
    _shuffle_gadget(prover, x_vars, y_vars)
    assert prover.deferred_constraints, "phase-2 callback must be deferred"
    proof = prover.prove(G, H)
    return proof, comms


def _verify_shuffle(proof, comms, label, g, h, G, H):
    tr = ProofTranscript(label)
    verifier = Verifier(tr)
    x_vars = [verifier.commit(c) for c in comms[:2]]
    y_vars = [verifier.commit(c) for c in comms[2:]]
    _shuffle_gadget(verifier, x_vars, y_vars)
    verifier.verify(proof, g, h, G, H)


def test_two_phase_shuffle(rng):
    G = get_generators("G", 16)
    H = get_generators("H", 16)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    label = b"ShuffleProof"

    xs = [Scalar(17), Scalar(42)]
    proof, comms = _prove_shuffle(xs, list(reversed(xs)), rng, label,
                                  g, h, G, H)
    _verify_shuffle(proof, comms, label, g, h, G, H)

    # soundness: a non-shuffle witness must not verify
    bad_proof, bad_comms = _prove_shuffle(
        [Scalar(17), Scalar(42)], [Scalar(17), Scalar(43)], rng, label,
        g, h, G, H)
    with pytest.raises(VerificationError):
        _verify_shuffle(bad_proof, bad_comms, label, g, h, G, H)


def test_two_phase_mixed_with_one_phase(rng):
    """2-phase shuffle composed with a 1-phase bound check in one proof:
    phase-1 multipliers (n1 > 0) AND phase-2 multipliers (n2 > 0) both
    present, so the u-factor padding paths (`prover.rs:374-434`) run with a
    non-trivial split."""
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    label = b"MixedPhases"

    tr = ProofTranscript(label)
    prover = Prover(g, h, tr)
    comms_bc = bound_check.prove_bounded_num(7, None, 0, 15, 4, rng, prover)
    xs = [Scalar(5), Scalar(9)]
    sh_comms, x_vars, y_vars = [], [], []
    for v in xs:
        com, var = prover.commit(v, Scalar.random(rng))
        sh_comms.append(com)
        x_vars.append(var)
    for v in reversed(xs):
        com, var = prover.commit(v, Scalar.random(rng))
        sh_comms.append(com)
        y_vars.append(var)
    _shuffle_gadget(prover, x_vars, y_vars)
    proof = prover.prove(G, H)

    tr_v = ProofTranscript(label)
    verifier = Verifier(tr_v)
    bound_check.verify_bounded_num(0, 15, 4, comms_bc, verifier)
    xv = [verifier.commit(c) for c in sh_comms[:2]]
    yv = [verifier.commit(c) for c in sh_comms[2:]]
    _shuffle_gadget(verifier, xv, yv)
    verifier.verify(proof, g, h, G, H)
