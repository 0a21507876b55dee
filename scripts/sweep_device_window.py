"""Device MSM window sweep at n=2^16 (round 3: the split plan + fused
pallas round may shift the optimum from c=8 — larger windows cut the
serial round count, which pallas makes relatively cheaper).

Usage: python scripts/sweep_device_window.py [c1,c2,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fj
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_host import G1

N = 1 << 16

def main():
    cs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                           else "8,10").split(",")]
    rnd = random.Random(0xBE7C)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rnd) for _ in range(256)]
        P = ej.to_device_points(base * (N // 256), ctx)
        vals = [rnd.randrange(BLS381.r) for _ in range(N)]
        s = jnp.asarray(fj.ints_to_limbs(vals, ctx.fr.L))
        want = None
        for c in cs:
            t0 = time.time()
            out = msm_mod.msm_hybrid(P, s[None], ctx, c)
            compile_s = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                out = msm_mod.msm_hybrid(P, s[None], ctx, c)
                ts.append(time.time() - t0)
            med = sorted(ts)[1]
            if want is None:
                want = out[0]
            assert out[0] == want, f"c={c} result mismatch"
            print(f"c={c}: p50 {med:.3f}s = {N/med/1e3:.0f}k pts/s "
                  f"(first {compile_s:.0f}s, rounds="
                  f"{msm_mod.occupancy_guess(N, ctx, c)})", flush=True)


if __name__ == "__main__":
    main()
