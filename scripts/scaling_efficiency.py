"""Sharded-MSM scaling-efficiency harness (north star: >=80% to N hosts).

Runs the sharded Pippenger at D = 1, 2, 4, 8 devices on the virtual CPU
mesh and reports points/s + efficiency vs D=1.  The virtual mesh is a
TOPOLOGY proxy: XLA-CPU emulates the collectives, so absolute numbers are
meaningless but the parallel decomposition, message counts, and the
round-count balance (the real scaling hazards) are exactly the production
ones.  The real-chip absolute number comes from bench.py on the v5e.

Also runs the 2-D (host x chip) hierarchical variant at 2x4 and 4x2 to
compare the DCN-stage message count against the flat 1-D butterfly.

Usage:  python scripts/scaling_efficiency.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("BP_UNROLL", "4")
os.environ.setdefault("BP_CIOS_UNROLL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.parallel import make_mesh, msm_sharded_jit
from bulletproofs_tpu.parallel.sharded_msm import (
    make_mesh_2d, msm_sharded_2d_jit)


def timeit(f, reps=3):
    out = f()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f()
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    c = 8
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        rnd = random.Random(0x5CA1E)
        base = [G1.random(rnd) for _ in range(256)]
        pts = (base * (n // 256 + 1))[:n]
        ks = [Scalar(rnd.randrange(BLS381.r)) for _ in range(n)]
        P = ej.to_device_points(pts, ctx)
        s = ej.to_device_scalars(ks, ctx)

        # NOTE on interpretation: all D virtual devices share ONE physical
        # core, so the ideal here is time(D) == time(1) (same total work,
        # perfectly interleaved) — NOT a D-fold speedup.  The printed
        # "serialization factor" time(D)/time(1) therefore measures the
        # decomposition + collective-emulation overhead only; real scaling
        # efficiency needs real chips (NOTES.md round-3 scaling section
        # gives the analytical ICI/DCN model).
        results = {}
        for d in (1, 2, 4, 8):
            mesh = make_mesh(jax.devices()[:d])
            t = timeit(lambda: msm_sharded_jit(P, s, ctx, c, mesh))
            results[d] = t
            fac = t / results[1]
            print(f"D={d}: {t*1e3:7.1f} ms  {n/t:9.0f} pts/s  "
                  f"serialization factor {fac:4.1f}x (1-core ideal 1.0)",
                  flush=True)

        for hosts, chips in ((2, 4), (4, 2)):
            mesh = make_mesh_2d(hosts, chips)
            t = timeit(lambda: msm_sharded_2d_jit(P, s, ctx, c, mesh))
            print(f"2-D {hosts}x{chips}: {t*1e3:7.1f} ms  {n/t:9.0f} pts/s "
                  f" serialization factor {t/results[1]:4.1f}x "
                  f"(hierarchical ICI->DCN)", flush=True)


if __name__ == "__main__":
    main()
