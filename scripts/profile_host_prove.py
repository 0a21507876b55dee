"""Profile the host/native prove path at BASELINE config #2 (m=16, n=2048).

Usage: python scripts/profile_host_prove.py [reps]

Prints a cProfile top-30 by cumulative time plus coarse wall-clock spans for
the protocol stages (synthesis, phase-1 MSMs, flatten, polys, t-commits, IPA),
so optimization targets are measured rather than guessed.  Run on a QUIET
machine (no background pytest — single physical core, see CLAUDE.md).
"""

import cProfile
import io
import os
import pstats
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # native path only; no tunnel touch

import bulletproofs_tpu as bp
from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu.models import bound_check
from bulletproofs_tpu.transcript import ProofTranscript


def build_and_prove(seed, g, h, G, H, spans):
    m, bits = 16, 64
    rng = random.Random(seed)
    vals = [rng.randrange(1 << 63) for _ in range(m)]
    tr = ProofTranscript(b"AggRange")
    p = bp.Prover(g, h, tr, rng=rng)
    t0 = time.perf_counter()
    comms = [bound_check.prove_bounded_num(
        v, None, 0, (1 << bits) - 1, bits, rng, p) for v in vals]
    spans["synthesis"] = spans.get("synthesis", 0) + time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = p.prove(G, H)
    spans["prove"] = spans.get("prove", 0) + time.perf_counter() - t0
    return proof, comms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    backend_mod.set_backend("auto")
    G = bp.get_generators("G", 2048)
    H = bp.get_generators("H", 2048)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")

    spans = {}
    build_and_prove(1, g, h, G, H, spans)       # warmup (lib build etc.)
    spans.clear()

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for seed in range(2, 2 + reps):
        build_and_prove(seed, g, h, G, H, spans)
    prof.disable()
    wall = time.perf_counter() - t0

    print(f"total wall {wall:.3f}s over {reps} reps "
          f"({wall / reps * 1000:.0f} ms/proof)")
    for k, v in spans.items():
        print(f"  {k:12s} {v / reps * 1000:8.1f} ms/proof")

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
