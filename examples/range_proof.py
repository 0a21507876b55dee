"""Minimal end-to-end demo: prove a committed value lies in a range.

Run: python examples/range_proof.py [--curve bls381|bn254|secp256k1]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import bulletproofs_tpu as bp
from bulletproofs_tpu.models.bound_check import (
    gen_proof_of_bounded_num, verify_proof_of_bounded_num)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="bls381",
                    choices=["bls381", "bn254", "secp256k1"])
    ap.add_argument("--bits", type=int, default=32)
    ap.add_argument("--value", type=int, default=None)
    args = ap.parse_args()

    with bp.using_curve(args.curve):
        rng = random.Random()
        n_gens = 2 * args.bits * 2
        G = bp.get_generators("G", n_gens)
        H = bp.get_generators("H", n_gens)
        g = bp.G1.from_msg_hash(b"g")
        h = bp.G1.from_msg_hash(b"h")

        lo, hi = 0, (1 << args.bits) - 1
        if args.value is None:
            args.value = rng.randrange(hi)
        assert lo <= args.value <= hi, "value outside the provable range"
        t0 = time.time()
        proof, commitments = gen_proof_of_bounded_num(
            args.value, None, lo, hi, args.bits, rng,
            b"range-proof-demo", g, h, G, H)
        t1 = time.time()
        verify_proof_of_bounded_num(
            lo, hi, args.bits, proof, commitments,
            b"range-proof-demo", g, h, G, H)
        t2 = time.time()

        print(f"curve={args.curve}  value in [{lo}, {hi}] proven")
        print(f"proof size: {len(proof.to_bytes())} bytes, "
              f"{len(commitments)} commitments")
        print(f"prove {t1 - t0:.3f}s  verify {t2 - t1:.3f}s")


if __name__ == "__main__":
    main()
