"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric this round: single-chip Pippenger MSM throughput at n = 2^16
over BLS12-381 — the kernel that dominates both proving (witness commitments,
IPA L/R, `/root/reference/src/ipp.rs:91,104`) and verification (the one
mega-MSM, `verifier.rs:431-456`; BASELINE config #3).

vs_baseline: the reference publishes no numbers and its Rust toolchain is not
available in this image (BASELINE.md), so the denominator is a documented
ESTIMATE of the reference's serial AMCL MSM throughput: ~30k points/s
(generous: assumes an optimized Pippenger over AMCL's ~0.5 us/field-mul
arithmetic; the reference's actual per-point var-time loop is slower).
"""

import json
import sys
import time

BASELINE_MSM_POINTS_PER_S = 30_000.0   # documented estimate, see module doc
N = 1 << 16
WINDOW = 8
REPS = 3


def main():
    import os
    os.environ.setdefault("BP_UNROLL", "64")
    os.environ.setdefault("BP_CIOS_UNROLL", "8")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp
    import random

    from bulletproofs_tpu.config import BLS381, using_curve
    from bulletproofs_tpu.ops import ec_jax as ej
    from bulletproofs_tpu.ops import msm as msm_mod
    from bulletproofs_tpu.ops.ec_host import G1

    rnd = random.Random(0xBE7C)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rnd) for _ in range(256)]
        pts = base * (N // 256)
        P = ej.to_device_points(pts, ctx)
        npr = np.random.RandomState(0)
        sl = npr.randint(0, 1 << 16, size=(ctx.fr.L, N)).astype(np.uint32)
        # full-range scalars below r: cap the top 16-bit limb under
        # r >> 240 = 0x73ED so every window has realistic digit entropy
        sl[ctx.fr.L - 1] %= 0x73ED
        s = jnp.asarray(sl)

        t0 = time.time()
        out = msm_mod.msm_device(P, s, ctx, WINDOW)
        out.block_until_ready()
        compile_s = time.time() - t0

        times = []
        for _ in range(REPS):
            t0 = time.time()
            out = msm_mod.msm_device(P, s, ctx, WINDOW)
            out.block_until_ready()
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        pps = N / med

        # BASELINE config #1 extras: single 64-bit range proof end to end
        # on the auto backend (native C++ below the device threshold)
        from bulletproofs_tpu.models import bound_check
        from bulletproofs_tpu.utils import get_generators
        Gg = get_generators("G", 256)
        Hh = get_generators("H", 256)
        g1 = G1.from_msg_hash(b"g")
        h1 = G1.from_msg_hash(b"h")
        t0 = time.time()
        proof, comms = bound_check.gen_proof_of_bounded_num(
            (1 << 62) + 5, None, 0, (1 << 64) - 1, 64, rnd, b"bench",
            g1, h1, Gg, Hh)
        prove_s = time.time() - t0
        t0 = time.time()
        bound_check.verify_proof_of_bounded_num(
            0, (1 << 64) - 1, 64, proof, comms, b"bench", g1, h1, Gg, Hh)
        verify_s = time.time() - t0

        print(json.dumps({
            "metric": "msm_points_per_s_n65536_bls381",
            "value": round(pps, 1),
            "unit": "points/s",
            "vs_baseline": round(pps / BASELINE_MSM_POINTS_PER_S, 2),
            "msm_seconds_p50": round(med, 4),
            "range_proof_64bit_prove_s": round(prove_s, 3),
            "range_proof_64bit_verify_s": round(verify_s, 3),
            "compile_seconds": round(compile_s, 1),
            "n": N,
            "window_bits": WINDOW,
            "device": str(jax.devices()[0]),
            "baseline_note": "estimated reference AMCL serial MSM, "
                             "see bench.py docstring",
        }))


if __name__ == "__main__":
    sys.exit(main())
