"""Hardware bit-exactness check: the production TPU MSM (chunked pallas,
mixed-add on affine tables) vs the exact-int host backend.

The pallas kernels are interpret-proven in CI (tests/test_pallas_chunk.py,
test_pallas_mixed.py); this script closes the loop on REAL Mosaic, where
layout/lowering bugs can exist that interpret mode never sees (e.g. the
round-3 block-spec sublane rule).  Run on first TPU contact after any
ec_pallas.py edit.

Usage: python scripts/tpu_bitexact_check.py [n] [c]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

# Pin the kernel-routing env so the legs provably exercise the kernels
# they are labeled with: BP_EC_KERNEL=xla or BP_MSM_MIXED=0 inherited from
# the shell would silently route BOTH legs elsewhere and report BIT-EXACT
# for kernels that never ran (ADVICE r3).
os.environ["BP_EC_KERNEL"] = "pallas"
os.environ["BP_MSM_MIXED"] = "1"

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fjx
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.cpp_backend import CppBackend
from bulletproofs_tpu.ops.ec_host import G1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if n < 8:
        sys.exit("usage: tpu_bitexact_check.py [n >= 8] [c] — the "
                 "adversarial scalar set needs at least 8 slots")
    rnd = random.Random(0xB17E)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        pts = [G1.random(rnd) for _ in range(n)]
        # adversarial scalar mix: zeros, ones, r-1, tiny, full-width
        vals = [0, 1, BLS381.r - 1, 2, BLS381.r - 2]
        vals += [rnd.randrange(BLS381.r) for _ in range(n - len(vals))]
        rnd.shuffle(vals)

        t0 = time.time()
        # native backend as ground truth (itself bit-exact vs the exact-int
        # host backend per tests/test_cross_backend.py)
        expect = CppBackend().msm(pts, vals)
        print(f"native msm ({time.time()-t0:.1f}s): done", flush=True)

        P, affine = ej.to_device_points_affine(pts, ctx)
        assert affine
        s = jnp.asarray(fjx.ints_to_limbs(vals, ctx.fr.L))

        for label, aff in (("chunk+mixed", True), ("chunk general", False)):
            t0 = time.time()
            got = msm_mod.msm_hybrid(P, s[None], ctx, c, affine=aff)[0]
            ok = got == expect
            print(f"{label:14s} ({time.time()-t0:.1f}s): "
                  f"{'BIT-EXACT' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                print(f"  got    {got}")
                print(f"  expect {expect}")
                sys.exit(1)
    print("all TPU MSM paths bit-exact vs host")


if __name__ == "__main__":
    main()
