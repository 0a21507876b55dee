"""Batch verification: k independent proofs checked with ONE mega-MSM.

Beyond-reference capability (`r1cs/verifier.py:batch_verify` — the
reference runs one MSM per proof, `verifier.rs:431-456`): the k
verification equations fold into one random linear combination sharing
the generator spans, and `Verifier.rebind` reuses a single synthesized
circuit across same-shape proofs.

    python examples/batch_verification.py [k] [m] [bits]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import bulletproofs_tpu as bp
from bulletproofs_tpu import batch_verify
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.transcript import ProofTranscript


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    n_gens = 1 << (2 * m * bits - 1).bit_length()
    G = bp.get_generators("G", n_gens)
    H = bp.get_generators("H", n_gens)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")
    hi = (1 << bits) - 1

    def make_proof(seed):
        rng = random.Random(seed)
        vals = [rng.randrange(1 << (bits - 1)) for _ in range(m)]
        tr = ProofTranscript(b"BatchDemo")
        prover = bp.Prover(g, h, tr, rng=rng)
        comms = [bound_check.prove_bounded_num(v, None, 0, hi, bits, rng,
                                               prover) for v in vals]
        return prover.prove(G, H), [c for grp in comms for c in grp]

    print(f"proving {k} proofs of {m} x {bits}-bit range checks each ...")
    proofs = [make_proof(1000 + i) for i in range(k)]

    def build_verifier(flat):
        tr = ProofTranscript(b"BatchDemo")
        v = bp.Verifier(tr)
        for j in range(0, len(flat), 3):
            bound_check.verify_bounded_num(0, hi, bits, flat[j:j + 3], v)
        return v

    # individual verification (one MSM each)
    t0 = time.time()
    for proof, flat in proofs:
        build_verifier(flat).verify(proof, g, h, G, H)
    t_indiv = time.time() - t0

    # template + batch: synthesize the circuit once, rebind per proof,
    # one combined mega-MSM for the whole batch
    template = build_verifier(proofs[0][1])
    t0 = time.time()
    items = [(template.rebind(ProofTranscript(b"BatchDemo"), flat), proof)
             for proof, flat in proofs]
    batch_verify(items, g, h, G, H, rng=random.Random(1))
    t_batch = time.time() - t0

    print(f"individual: {t_indiv:.3f}s ({t_indiv / k * 1000:.0f} ms/proof)")
    print(f"batched:    {t_batch:.3f}s ({t_batch / k * 1000:.0f} ms/proof)"
          f"  -> {t_indiv / t_batch:.2f}x")

    # a tampered proof fails the whole batch (then bisect individually)
    bad = bp.R1CSProof.from_bytes(proofs[0][0].to_bytes())
    bad.t_x = bad.t_x + bp.Scalar(1)
    items = [(template.rebind(ProofTranscript(b"BatchDemo"), flat),
              bad if i == 0 else proof)
             for i, (proof, flat) in enumerate(proofs)]
    try:
        batch_verify(items, g, h, G, H, rng=random.Random(1))
        raise SystemExit("tampered batch verified?!")
    except bp.utils.errors.VerificationError:
        print("tampered batch rejected, as expected")


if __name__ == "__main__":
    main()
