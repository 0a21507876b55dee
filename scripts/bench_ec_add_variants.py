"""Race ec_add variants at the MSM bucket-loop shape (round 3).

Usage: python scripts/bench_ec_add_variants.py <variant>
  xla        — production ec_add (env-controlled unroll)
  pallas     — fused Mosaic kernel (scripts/ec_pallas_experiment lineage)

Env: BP_UNROLL / BP_CIOS_UNROLL set by the caller per run.
Measures a 400-iteration fori_loop over (3, L, 8192) lanes — the add_only
decomposition of the bucket round (scripts/profile_msm_round.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops.ec_host import G1

R = 400
NLANES = 8192


def timeit(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    variant = sys.argv[1]
    rnd = random.Random(1)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rnd) for _ in range(256)]
        P = ej.to_device_points(base * (NLANES // 256), ctx)  # (3, L, n)
        Q = ej.to_device_points(base[::-1] * (NLANES // 256), ctx)
        L = P.shape[1]

        if variant == "xla":
            @jax.jit
            def loop(b, d):
                def body(t, acc):
                    return ej.ec_add(acc, d, ctx)
                return jax.lax.fori_loop(0, R, body, b)
        elif variant == "pallas":
            from bulletproofs_tpu.ops.ec_pallas import ec_add_pallas

            @jax.jit
            def loop(b, d):
                def body(t, acc):
                    return ec_add_pallas(acc, d, ctx)
                return jax.lax.fori_loop(0, R, body, b)
        else:
            raise SystemExit(f"unknown variant {variant}")

        t = timeit(loop, P, Q)
        per_round = t / R
        print(f"{variant} UNROLL={os.environ.get('BP_UNROLL')} "
              f"CIOS={os.environ.get('BP_CIOS_UNROLL')}: "
              f"{t*1e3:.1f} ms total, {per_round*1e6:.0f} us/round, "
              f"{R*NLANES/t/1e6:.1f} M adds/s", flush=True)

        # correctness vs host
        out = loop(P[:, :, :256], Q[:, :, :256])
        got = ej.from_device_points(out, ctx)
        want_one = base[0]
        for _ in range(R):
            want_one = want_one + base[255]
        assert got[0] == want_one, "mismatch vs host chain"
        print("bit-exact vs host", flush=True)


if __name__ == "__main__":
    main()
