"""Aggregated range proofs: m bound-check gadgets in ONE R1CS proof.

The reference aggregates by composing gadget instances on a single Prover
(`/root/reference/tests/multiple_constraint_systems.rs:25-96`); this is
BASELINE config #2 (m=16 x 64-bit).  With the jax backend selected, the
whole prove runs on the TPU device path (witness MSMs, z-fold, vector
polys, implicit-basis IPA — ops/prover_device.py).

    python examples/aggregated_range_proof.py [m] [bits] [backend]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import bulletproofs_tpu as bp
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.transcript import ProofTranscript


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if len(sys.argv) > 3:
        bp.set_backend(sys.argv[3])

    n_gens = 1 << (2 * m * bits - 1).bit_length()
    G = bp.get_generators("G", n_gens)
    H = bp.get_generators("H", n_gens)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")

    rng = random.Random()
    vals = [rng.randrange(1 << (bits - 1)) for _ in range(m)]

    tr = ProofTranscript(b"AggRange")
    prover = bp.Prover(g, h, tr, rng=rng)
    comms = []
    for v in vals:
        comms.append(bound_check.prove_bounded_num(
            v, None, 0, (1 << bits) - 1, bits, rng, prover))
    t0 = time.time()
    proof = prover.prove(G, H)
    t_prove = time.time() - t0
    print(f"proved {m} x {bits}-bit range proofs in one R1CS proof "
          f"({prover.num_multipliers()} multipliers) in {t_prove:.3f}s "
          f"-> {m / t_prove:.2f} proofs/s")

    tr_v = ProofTranscript(b"AggRange")
    verifier = bp.Verifier(tr_v)
    for cm in comms:
        bound_check.verify_bounded_num(0, (1 << bits) - 1, bits, cm,
                                       verifier)
    t0 = time.time()
    verifier.verify(proof, g, h, G, H)
    print(f"verified in {time.time() - t0:.3f}s "
          f"({len(proof.to_bytes())} proof bytes)")


if __name__ == "__main__":
    main()
