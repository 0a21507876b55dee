"""Gadget suite round-trip tests, modeled on the reference's inline gadget
tests (`non_zero.rs:102-128`, `set_membership.rs:148-184`,
`set_membership_alt.rs:221-259`, `set_non_membership.rs:166-212`,
`mimc.rs:154-216`) plus negative soundness checks the reference lacks
(SURVEY.md section 4)."""

import pytest

from bulletproofs_tpu import models
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.utils import VerificationError, get_generators


@pytest.fixture(scope="module")
def gens():
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    return g, h, G, H


def test_non_zero(gens, rng):
    g, h, G, H = gens
    value = Scalar.random(rng)
    proof, comms = models.non_zero.gen_proof_of_non_zero_val(
        value, None, rng, b"NonZero", g, h, G, H)
    models.non_zero.verify_proof_of_non_zero_val(
        proof, comms, b"NonZero", g, h, G, H)
    # wrong transcript label must fail
    with pytest.raises(VerificationError):
        models.non_zero.verify_proof_of_non_zero_val(
            proof, comms, b"Other", g, h, G, H)


def test_set_membership(gens, rng):
    g, h, G, H = gens
    set_values = [Scalar(v) for v in (2, 3, 5, 6, 8, 20, 25)]
    proof, comms = models.set_membership.gen_proof_of_set_membership(
        Scalar(3), None, set_values, rng, b"SetMemb", g, h, G, H)
    models.set_membership.verify_proof_of_set_membership(
        set_values, proof, comms, b"SetMemb", g, h, G, H)


def test_set_membership_not_member_fails(gens, rng):
    g, h, G, H = gens
    set_values = [Scalar(v) for v in (2, 3, 5)]
    # prover commits honest diffs for a non-member; product != 0 so the
    # final constraint is unsatisfied and verification must fail
    proof, comms = models.set_membership.gen_proof_of_set_membership(
        Scalar(4), None, set_values, rng, b"SetMemb", g, h, G, H)
    with pytest.raises(VerificationError):
        models.set_membership.verify_proof_of_set_membership(
            set_values, proof, comms, b"SetMemb", g, h, G, H)


def test_set_membership_alt(gens, rng):
    g, h, G, H = gens
    set_values = [2, 3, 5, 6, 8, 20, 25]
    proof, comms = models.set_membership_alt.gen_proof_of_set_membership_alt(
        20, None, set_values, rng, b"SetMembAlt", g, h, G, H)
    models.set_membership_alt.verify_proof_of_set_membership_alt(
        set_values, proof, comms, b"SetMembAlt", g, h, G, H)


def test_set_non_membership(gens, rng):
    g, h, G, H = gens
    set_values = [Scalar(v) for v in (2, 3, 5, 6, 8, 20, 25)]
    proof, comms = \
        models.set_non_membership.gen_proof_of_set_non_membership(
            Scalar(10), None, set_values, rng, b"SetNonMemb", g, h, G, H)
    models.set_non_membership.verify_proof_of_set_non_membership(
        set_values, proof, comms, b"SetNonMemb", g, h, G, H)


def test_mimc(gens, rng):
    g, h, G, H = gens
    rounds = 16    # reference test uses 322; smaller keeps CI quick
    constants = [Scalar.random(rng) for _ in range(rounds)]
    xl, xr = Scalar.random(rng), Scalar.random(rng)
    image = models.helper_constraints.mimc.mimc(xl, xr, constants, rounds)
    proof, comms = \
        models.mimc.gen_proof_of_knowledge_of_preimage_of_mimc(
            [xl, xr], None, image, constants, rounds, rng,
            b"MiMC", g, h, G, H)
    models.mimc.verify_knowledge_of_preimage_of_mimc(
        image, constants, rounds, proof, comms, b"MiMC", g, h, G, H)
    # wrong image fails
    with pytest.raises(VerificationError):
        models.mimc.verify_knowledge_of_preimage_of_mimc(
            image + Scalar(1), constants, rounds, proof, comms,
            b"MiMC", g, h, G, H)
