"""Cross-check the streaming `_flattened_constraints` against the explicit
debug weight-matrix path (the reference keeps the same cross-check behind
#[cfg(test)], `prover.rs:186-281`), plus the `gen_challenges` utility."""

from bulletproofs_tpu.models.bound_check import prove_bounded_num
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.r1cs import Prover
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import gen_challenges


def test_flattened_constraints_match_matrices(rng):
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    tr = ProofTranscript(b"debug")
    prover = Prover(g, h, tr, rng=rng)
    prove_bounded_num(42, None, 10, 100, 16, rng, prover)

    z = Scalar.random(rng)
    wL, wR, wO, wV = prover._flattened_constraints(z)
    eL, eR, eO, eV = prover.flattened_constraints_elaborated(z)
    assert (wL, wR, wO, wV) == (eL, eR, eO, eV)


def test_gen_challenges(rng):
    pts = [G1.random(rng) for _ in range(3)]
    state = bytearray()
    ch = gen_challenges(pts, state, 4)
    assert len(ch) == 4 and len(set(c.v for c in ch)) == 4
    state2 = bytearray()
    assert gen_challenges(pts, state2, 4) == ch
