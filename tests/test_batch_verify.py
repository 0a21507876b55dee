"""Batch verification: k proofs in ONE mega-MSM via a random linear
combination (`r1cs.verifier.batch_verify` — beyond-reference capability;
the reference verifies one proof per MSM, `verifier.rs:431-456`)."""

import random

import pytest

import bulletproofs_tpu as bp
from bulletproofs_tpu import batch_verify
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils.errors import VerificationError


BITS = 16


def _make_proof(seed, g, h, G, H, m=2):
    rng = random.Random(seed)
    vals = [rng.randrange(1 << (BITS - 1)) for _ in range(m)]
    tr = ProofTranscript(b"batch")
    p = bp.Prover(g, h, tr, rng=rng)
    comms = [bound_check.prove_bounded_num(
        v, None, 0, (1 << BITS) - 1, BITS, rng, p) for v in vals]
    return p.prove(G, H), comms


def _verifier_for(comms, g, h):
    tr = ProofTranscript(b"batch")
    v = bp.Verifier(tr)
    for cm in comms:
        bound_check.verify_bounded_num(0, (1 << BITS) - 1, BITS, cm, v)
    return v


@pytest.fixture(scope="module")
def setup():
    G = bp.get_generators("G", 128)
    H = bp.get_generators("H", 128)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")
    proofs = [_make_proof(100 + i, g, h, G, H) for i in range(4)]
    return g, h, G, H, proofs


def test_batch_verify_accepts(setup):
    g, h, G, H, proofs = setup
    items = [(_verifier_for(comms, g, h), proof) for proof, comms in proofs]
    batch_verify(items, g, h, G, H, rng=random.Random(7))


def test_batch_matches_individual(setup):
    """Every proof in the batch also verifies individually (same verifier
    construction), i.e. batching changes no transcript semantics."""
    g, h, G, H, proofs = setup
    for proof, comms in proofs:
        _verifier_for(comms, g, h).verify(proof, g, h, G, H)


def test_batch_verify_rejects_one_bad(setup):
    g, h, G, H, proofs = setup
    bad = bp.R1CSProof.from_bytes(proofs[2][0].to_bytes())
    bad.t_x = bad.t_x + bp.Scalar(1)
    items = []
    for i, (proof, comms) in enumerate(proofs):
        items.append((_verifier_for(comms, g, h),
                      bad if i == 2 else proof))
    with pytest.raises(VerificationError):
        batch_verify(items, g, h, G, H, rng=random.Random(7))


def test_batch_verify_rejects_swapped_commitments(setup):
    """A valid proof against the WRONG circuit commitments must fail."""
    g, h, G, H, proofs = setup
    items = [(_verifier_for(proofs[1][1], g, h), proofs[0][0]),
             (_verifier_for(proofs[1][1], g, h), proofs[1][0])]
    with pytest.raises(VerificationError):
        batch_verify(items, g, h, G, H, rng=random.Random(7))


def test_rebind_template_verifier(setup):
    """rebind: one synthesized circuit reused across same-shape proofs —
    accepts good proofs (individually and batched) and rejects bad."""
    g, h, G, H, proofs = setup
    template = _verifier_for(proofs[0][1], g, h)

    def flat(comms):
        # rebind takes the V commitments in commit order (3 per gadget)
        return [c for grp in comms for c in grp]

    items = []
    for proof, comms in proofs:
        v = template.rebind(ProofTranscript(b"batch"), flat(comms))
        items.append((v, proof))
    batch_verify(items, g, h, G, H, rng=random.Random(11))
    # rebound verifier also works for individual verify
    template.rebind(ProofTranscript(b"batch"), flat(proofs[1][1])).verify(
        proofs[1][0], g, h, G, H)
    bad = bp.R1CSProof.from_bytes(proofs[0][0].to_bytes())
    bad.e_blinding = bad.e_blinding + bp.Scalar(1)
    with pytest.raises(VerificationError):
        template.rebind(
            ProofTranscript(b"batch"), flat(proofs[0][1])).verify(
            bad, g, h, G, H)


def test_batch_mixed_circuit_sizes(setup):
    """Proofs with different padded_n in one batch (generator spans are
    shared up to the max)."""
    g, h, G, H, proofs = setup
    big_proof, big_comms = _make_proof(500, g, h, G, H, m=4)
    items = [(_verifier_for(proofs[0][1], g, h), proofs[0][0]),
             (_verifier_for(big_comms, g, h), big_proof)]
    batch_verify(items, g, h, G, H, rng=random.Random(9))


def test_batch_verify_localizes_one_bad_of_8(setup):
    """One corrupted proof among 8: the bisect fallback names its index
    (VERDICT r3 task 7)."""
    from bulletproofs_tpu.utils.errors import BatchVerificationError
    g, h, G, H, proofs = setup
    eight = (proofs * 2)[:8]
    bad = bp.R1CSProof.from_bytes(eight[5][0].to_bytes())
    bad.t_x = bad.t_x + bp.Scalar(1)
    items = [(_verifier_for(comms, g, h), bad if i == 5 else proof)
             for i, (proof, comms) in enumerate(eight)]
    with pytest.raises(BatchVerificationError) as ei:
        batch_verify(items, g, h, G, H, rng=random.Random(7))
    assert ei.value.failed_indices == [5]


def test_batch_verify_localizes_two_bad(setup):
    from bulletproofs_tpu.utils.errors import BatchVerificationError
    g, h, G, H, proofs = setup

    def corrupt(proof):
        b = bp.R1CSProof.from_bytes(proof.to_bytes())
        b.e_blinding = b.e_blinding + bp.Scalar(3)
        return b

    items = []
    for i, (proof, comms) in enumerate(proofs):
        items.append((_verifier_for(comms, g, h),
                      corrupt(proof) if i in (0, 3) else proof))
    with pytest.raises(BatchVerificationError) as ei:
        batch_verify(items, g, h, G, H, rng=random.Random(3))
    assert ei.value.failed_indices == [0, 3]


def test_batch_verify_localize_off(setup):
    """localize=False keeps the single combined check and a plain error."""
    from bulletproofs_tpu.utils.errors import BatchVerificationError
    g, h, G, H, proofs = setup
    bad = bp.R1CSProof.from_bytes(proofs[1][0].to_bytes())
    bad.t_x = bad.t_x + bp.Scalar(1)
    items = [(_verifier_for(comms, g, h), bad if i == 1 else proof)
             for i, (proof, comms) in enumerate(proofs)]
    with pytest.raises(VerificationError) as ei:
        batch_verify(items, g, h, G, H, rng=random.Random(7),
                     localize=False)
    assert not isinstance(ei.value, BatchVerificationError)


def test_bisect_batch_failures_unit():
    """The bisect helper finds every bad index of a linear check."""
    from bulletproofs_tpu.utils.errors import bisect_batch_failures
    for k, bad_set in [(8, {5}), (8, {0, 3}), (5, {0, 2, 4}), (2, {1}),
                       (9, {8}), (7, set(range(7)))]:
        calls = []

        def check(idxs, bad_set=bad_set, calls=calls):
            calls.append(list(idxs))
            return not (set(idxs) & bad_set)

        assert bisect_batch_failures(check, k) == sorted(bad_set)


# ---- standalone IPA batch verification (ipp.batch_verify_ipp) ----

def _make_ipa(seed, n, Q, G, H):
    from bulletproofs_tpu import create_ipp
    from bulletproofs_tpu.ops.field_host import Scalar, inner_product
    from bulletproofs_tpu.ops.ec_host import msm_host
    rng = random.Random(seed)
    one = Scalar.one()
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    Gf = [one] * n
    Hf = [one] * n
    proof = create_ipp(ProofTranscript(b"bipa"), Q, Gf, Hf, G, H, a, b)
    P = msm_host(list(G) + list(H) + [Q],
                 a + b + [inner_product(a, b)])
    return proof, P, Gf, Hf


def test_batch_verify_ipp_accepts_and_rejects():
    from bulletproofs_tpu import batch_verify_ipp, verify_ipp
    n = 32
    G = bp.get_generators("G", n)
    H = bp.get_generators("H", n)
    Q = bp.G1.from_msg_hash(b"Q")
    made = [_make_ipa(600 + i, n, Q, G, H) for i in range(3)]

    def items(tamper=None):
        out = []
        for i, (pr, P, Gf, Hf) in enumerate(made):
            a = pr.a + bp.Scalar(1) if i == tamper else pr.a
            out.append((ProofTranscript(b"bipa"), Gf, Hf, P, Q,
                        a, pr.b, pr.L, pr.R))
        return out

    # individual verifies pass (sanity of the fixtures)
    for tr, Gf, Hf, P, Qp, a, b_, L, R in items():
        verify_ipp(n, tr, Gf, Hf, P, Qp, G, H, a, b_, L, R)
    batch_verify_ipp(n, G, H, items(), rng=random.Random(5))
    with pytest.raises(VerificationError):
        batch_verify_ipp(n, G, H, items(tamper=1), rng=random.Random(5))


def test_batch_verify_ipp_localizes():
    """One tampered IPA proof among 8 is named by index; works on both the
    native and pure-Python combination paths."""
    from bulletproofs_tpu import batch_verify_ipp
    from bulletproofs_tpu.utils.errors import BatchVerificationError
    n = 32
    G = bp.get_generators("G", n)
    H = bp.get_generators("H", n)
    Q = bp.G1.from_msg_hash(b"Q")
    made = [_make_ipa(800 + i, n, Q, G, H) for i in range(4)] * 2

    def items(tamper):
        out = []
        for i, (pr, P, Gf, Hf) in enumerate(made):
            a = pr.a + bp.Scalar(1) if i == tamper else pr.a
            out.append((ProofTranscript(b"bipa"), Gf, Hf, P, Q,
                        a, pr.b, pr.L, pr.R))
        return out

    with pytest.raises(BatchVerificationError) as ei:
        batch_verify_ipp(n, G, H, items(6), rng=random.Random(5))
    assert ei.value.failed_indices == [6]


def test_batch_verify_ipp_python_fallback(monkeypatch):
    """The pure-Python combination path (BP_IPA_NATIVE_COMB=0) must agree
    with the native bp_ipa_svector/bp_axpy path — including localization."""
    import bulletproofs_tpu.ipp as ipp_mod
    from bulletproofs_tpu.utils.errors import BatchVerificationError

    n = 128                                # deeper s-vector recurrence
    G = bp.get_generators("G", n)
    H = bp.get_generators("H", n)
    Q = bp.G1.from_msg_hash(b"Q")
    made = [_make_ipa(700 + i, n, Q, G, H) for i in range(2)]
    items = [(ProofTranscript(b"bipa"), Gf, Hf, P, Q, pr.a, pr.b,
              pr.L, pr.R) for pr, P, Gf, Hf in made]
    ipp_mod.batch_verify_ipp(n, G, H, items, rng=random.Random(5))

    monkeypatch.setenv("BP_IPA_NATIVE_COMB", "0")
    items = [(ProofTranscript(b"bipa"), Gf, Hf, P, Q, pr.a, pr.b,
              pr.L, pr.R) for pr, P, Gf, Hf in made]
    ipp_mod.batch_verify_ipp(n, G, H, items, rng=random.Random(5))

    # localization on the python path
    items = []
    for i, (pr, P, Gf, Hf) in enumerate(made):
        a = pr.a + bp.Scalar(1) if i == 0 else pr.a
        items.append((ProofTranscript(b"bipa"), Gf, Hf, P, Q, a, pr.b,
                      pr.L, pr.R))
    with pytest.raises(BatchVerificationError) as ei:
        ipp_mod.batch_verify_ipp(n, G, H, items, rng=random.Random(5))
    assert ei.value.failed_indices == [0]
