"""Randomized-circuit property test: arbitrary LC structures (duplicate
variables, constant terms, negations, chained multiplier reuse) through
prove/verify, with host and native backends byte-identical.

Gadget-generated circuits have regular shapes; this exercises the
constraint algebra paths (`linear_combination.rs:30-111` duplicate-keeping
semantics, the streaming z-fold `prover.rs:142-184`) on adversarially
messy inputs.
"""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils.errors import VerificationError


def _build_circuit(cs, seed, committed_vars, values):
    """Deterministic circuit from `seed`, identical for prover/verifier.
    `values` are the public-in-coefficient committed values (the circuit
    pins each committed var to its value — contrived but structurally
    rich).  Every constraint is satisfied by construction."""
    rng = random.Random(seed)
    pool = list(committed_vars)

    # pin committed vars: v_i - value_i * One == 0 (exercises ONE terms)
    for var, val in zip(committed_vars, values):
        cs.constrain(var - bp.Scalar(val))

    for step in range(rng.randrange(4, 10)):
        def rand_lc():
            terms = []
            for _ in range(rng.randrange(1, 4)):
                v = pool[rng.randrange(len(pool))]
                coeff = rng.randrange(-3, 4)
                terms.append(v * bp.Scalar(coeff))
            lc = terms[0]
            for t in terms[1:]:
                lc = lc + t
            if rng.random() < 0.3:
                lc = lc + bp.Scalar(rng.randrange(5))   # constant term
            if rng.random() < 0.3:
                v = pool[rng.randrange(len(pool))]
                lc = lc + v - v          # duplicate var, cancelling coeffs
            return lc

        a_lc, b_lc = rand_lc(), rand_lc()
        a, b, o = cs.multiply(a_lc, b_lc)
        pool += [a, b, o]
        if rng.random() < 0.5:
            # trivially-zero extra constraint with duplicate variables
            v = pool[rng.randrange(len(pool))]
            cs.constrain(v + v - (v * bp.Scalar(2)))


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_circuit_roundtrip_cross_backend(seed):
    G = bp.get_generators("G", 64)
    H = bp.get_generators("H", 64)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")
    crng = random.Random(1000 + seed)
    values = [crng.randrange(1, 1 << 32) for _ in range(3)]

    def prove(backend):
        backend_mod.set_backend(backend)
        try:
            rng = random.Random(seed)
            tr = ProofTranscript(b"rand")
            p = bp.Prover(g, h, tr, rng=rng)
            cvars = [p.commit(bp.Scalar(v), bp.Scalar.random(rng))[1]
                     for v in values]
            _build_circuit(p, seed, cvars, values)
            return p.prove(G, H)
        finally:
            backend_mod.set_backend("auto")

    proof_host = prove("host")
    proof_cpp = prove("cpp")
    assert proof_host.to_bytes() == proof_cpp.to_bytes(), \
        "host and native provers diverge on a random circuit"

    # verify (note: verifier rebuilds commitments from the prover run)
    rng = random.Random(seed)
    tr = ProofTranscript(b"rand")
    p = bp.Prover(g, h, tr, rng=rng)
    comms = [p.commit(bp.Scalar(v), bp.Scalar.random(rng))[0]
             for v in values]

    trv = ProofTranscript(b"rand")
    v = bp.Verifier(trv)
    cvars = [v.commit(cm) for cm in comms]
    _build_circuit(v, seed, cvars, values)
    v.verify(proof_host, g, h, G, H)

    # tamper: flip a committed value in the verifier's circuit
    trv2 = ProofTranscript(b"rand")
    v2 = bp.Verifier(trv2)
    cvars2 = [v2.commit(cm) for cm in comms]
    _build_circuit(v2, seed, cvars2, [values[0] + 1] + values[1:])
    with pytest.raises(VerificationError):
        v2.verify(proof_host, g, h, G, H)
