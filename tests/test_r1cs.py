"""Raw ConstraintSystem API tests (mirrors `/root/reference/tests/r1cs.rs`):
factor knowledge p*q=r and p*q*r=s without gadgets, plus negative cases."""

import pytest

from bulletproofs_tpu import set_backend
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.r1cs import Prover, Verifier
from bulletproofs_tpu.r1cs.linear_combination import LinearCombination
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.utils.errors import R1CSError

set_backend("host")


def _gens(n=128):
    return (get_generators("G", n), get_generators("H", n),
            G1.from_msg_hash(b"g"), G1.from_msg_hash(b"h"))


def test_factors(rng):
    """Prove knowledge of p, q with p*q = r (tests/r1cs.rs factors test)."""
    G, H, g, h = _gens()
    p_val, q_val = 17, 19
    r_val = p_val * q_val

    tr = ProofTranscript(b"Factors")
    prover = Prover(g, h, tr, rng=rng)
    com_p, var_p = prover.commit(Scalar(p_val), Scalar.random(rng))
    com_q, var_q = prover.commit(Scalar(q_val), Scalar.random(rng))
    _, _, o = prover.multiply(LinearCombination.from_var(var_p),
                              LinearCombination.from_var(var_q))
    prover.constrain(o - Scalar(r_val))
    proof = prover.prove(G, H)

    tr2 = ProofTranscript(b"Factors")
    verifier = Verifier(tr2)
    var_p = verifier.commit(com_p)
    var_q = verifier.commit(com_q)
    _, _, o = verifier.multiply(LinearCombination.from_var(var_p),
                                LinearCombination.from_var(var_q))
    verifier.constrain(o - Scalar(r_val))
    verifier.verify(proof, g, h, G, H)


def test_factors_wrong_product_rejected(rng):
    G, H, g, h = _gens()
    tr = ProofTranscript(b"Factors")
    prover = Prover(g, h, tr, rng=rng)
    com_p, var_p = prover.commit(Scalar(17), Scalar.random(rng))
    com_q, var_q = prover.commit(Scalar(19), Scalar.random(rng))
    _, _, o = prover.multiply(LinearCombination.from_var(var_p),
                              LinearCombination.from_var(var_q))
    prover.constrain(o - Scalar(17 * 19))
    proof = prover.prove(G, H)

    tr2 = ProofTranscript(b"Factors")
    verifier = Verifier(tr2)
    var_p = verifier.commit(com_p)
    var_q = verifier.commit(com_q)
    _, _, o = verifier.multiply(LinearCombination.from_var(var_p),
                                LinearCombination.from_var(var_q))
    verifier.constrain(o - Scalar(17 * 19 + 1))  # wrong public value
    with pytest.raises(R1CSError):
        verifier.verify(proof, g, h, G, H)


def test_factors_three_way(rng):
    """p*q*r = s with two chained multipliers (tests/r1cs.rs)."""
    G, H, g, h = _gens()
    p_val, q_val, r_val = 5, 7, 11
    s_val = p_val * q_val * r_val

    def build(cs, vars_):
        vp, vq, vr = vars_
        _, _, o1 = cs.multiply(LinearCombination.from_var(vp),
                               LinearCombination.from_var(vq))
        _, _, o2 = cs.multiply(LinearCombination.from_var(o1),
                               LinearCombination.from_var(vr))
        cs.constrain(o2 - Scalar(s_val))

    tr = ProofTranscript(b"Factors3")
    prover = Prover(g, h, tr, rng=rng)
    coms_vars = [prover.commit(Scalar(v), Scalar.random(rng))
                 for v in (p_val, q_val, r_val)]
    build(prover, [v for _, v in coms_vars])
    proof = prover.prove(G, H)

    tr2 = ProofTranscript(b"Factors3")
    verifier = Verifier(tr2)
    vars_ = [verifier.commit(c) for c, _ in coms_vars]
    build(verifier, vars_)
    verifier.verify(proof, g, h, G, H)


def test_proof_serialization_roundtrip(rng):
    from bulletproofs_tpu.r1cs.proof import R1CSProof
    G, H, g, h = _gens()
    tr = ProofTranscript(b"Ser")
    prover = Prover(g, h, tr, rng=rng)
    com, var = prover.commit(Scalar(6), Scalar.random(rng))
    _, _, o = prover.multiply(LinearCombination.from_var(var),
                              LinearCombination.from_var(var))
    prover.constrain(o - Scalar(36))
    proof = prover.prove(G, H)

    blob = proof.to_bytes()
    proof2 = R1CSProof.from_bytes(blob)
    assert proof2.to_bytes() == blob

    tr2 = ProofTranscript(b"Ser")
    verifier = Verifier(tr2)
    var = verifier.commit(com)
    _, _, o = verifier.multiply(LinearCombination.from_var(var),
                                LinearCombination.from_var(var))
    verifier.constrain(o - Scalar(36))
    verifier.verify(proof2, g, h, G, H)

    json_blob = proof.to_json()
    proof3 = R1CSProof.from_json(json_blob)
    assert proof3.to_bytes() == blob


def test_allocate_pairing(rng):
    """allocate() pairs two consecutive wires into one multiplier."""
    G, H, g, h = _gens()
    tr = ProofTranscript(b"Alloc")
    prover = Prover(g, h, tr, rng=rng)
    v1 = prover.allocate(Scalar(3))
    v2 = prover.allocate(Scalar(4))
    assert v1.index == v2.index
    assert prover.a_O[v1.index] == Scalar(12)
    assert prover.num_multipliers() == 1
