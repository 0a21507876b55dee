"""Inner-product argument (mirrors `ipp.rs:318-490` tests)."""

import pytest

from bulletproofs_tpu import set_backend
from bulletproofs_tpu.ipp import create_ipp, verify_ipp
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import (Scalar, hadamard_product,
                                             inner_product,
                                             vandermonde_vector)
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.utils.errors import VerificationError

set_backend("host")


def _run_ipp(a_ints, b_ints, n, rng):
    a = [Scalar(x) for x in a_ints]
    b = [Scalar(x) for x in b_ints]
    G = get_generators("g", n)
    H = get_generators("h", n)
    Q = G1.from_msg_hash(b"Q")
    G_factors = [Scalar.one()] * n
    y_inv = Scalar.random(rng)
    H_factors = vandermonde_vector(y_inv, n)

    tr = ProofTranscript(b"innerproduct")
    proof = create_ipp(tr, Q, G_factors, H_factors, G, H, a, b)

    # P = <a, G> + <b o y^i, H> + <a,b> Q
    b_prime = hadamard_product(b, H_factors)
    c = inner_product(a, b)
    P = msm_host(G + H + [Q], a + b_prime + [c])

    tr2 = ProofTranscript(b"innerproduct")
    verify_ipp(n, tr2, G_factors, H_factors, P, Q, G, H, proof.a, proof.b,
               proof.L, proof.R)
    return proof, P, G_factors, H_factors, G, H, Q


def test_ipp_n4(rng):
    """`test_ipp` (ipp.rs:325-390)."""
    _run_ipp([1, 2, 3, 4], [5, 6, 7, 8], 4, rng)


def test_ipp_non_power_of_2(rng):
    """`test_ipp_non_power_of_2` (ipp.rs:392-489): zero-padding to n=8 does
    not change the commitment built from unpadded vectors."""
    orig_a, orig_b = [1, 2, 3, 4, 9], [5, 6, 7, 8, 10]
    a = [Scalar(x) for x in orig_a + [0, 0, 0]]
    b = [Scalar(x) for x in orig_b + [0, 0, 0]]
    n = 8
    G = get_generators("g", n)
    H = get_generators("h", n)
    Q = G1.from_msg_hash(b"Q")
    G_factors = [Scalar.one()] * n
    y_inv = Scalar.random(rng)
    H_factors = vandermonde_vector(y_inv, n)

    tr = ProofTranscript(b"innerproduct")
    proof = create_ipp(tr, Q, G_factors, H_factors, G, H, a, b)

    oa = [Scalar(x) for x in orig_a]
    ob = [Scalar(x) for x in orig_b]
    b_prime = hadamard_product(ob, H_factors[:5])
    c = inner_product(oa, ob)
    P = msm_host(G[:5] + H[:5] + [Q], oa + b_prime + [c])

    tr2 = ProofTranscript(b"innerproduct")
    verify_ipp(n, tr2, G_factors, H_factors, P, Q, G, H, proof.a, proof.b,
               proof.L, proof.R)


def test_ipp_larger(rng):
    n = 64
    a = [rng.randrange(1 << 64) for _ in range(n)]
    b = [rng.randrange(1 << 64) for _ in range(n)]
    _run_ipp(a, b, n, rng)


def test_ipp_tampered_rejected(rng):
    proof, P, Gf, Hf, G, H, Q = _run_ipp([1, 2, 3, 4], [5, 6, 7, 8], 4, rng)
    bad_a = proof.a + Scalar.one()
    tr = ProofTranscript(b"innerproduct")
    with pytest.raises(VerificationError):
        verify_ipp(4, tr, Gf, Hf, P, Q, G, H, bad_a, proof.b,
                   proof.L, proof.R)


def test_ipp_n1(rng):
    """Degenerate single-element case: no rounds, P check direct."""
    _run_ipp([7], [9], 1, rng)
