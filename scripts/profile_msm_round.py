"""Decompose the device MSM bucket-round cost on real TPU.

Question (round 3): the in-loop pure ec_add runs at ~0.09 ms / 8192 lanes
(NOTES.md), but a full bucket round costs ~0.7 ms.  Where do the other
~0.6 ms go — the row gather, the (slots, 3L) -> (3, L, slots) transpose,
the where-mask, or the loop structure itself?

Variants timed (all fori_loop over the same static round count, same
shapes as the production n=2^16 / c=8 MSM):
  add_only      — ec_add of a CONSTANT point array into buckets (no gather)
  gather_only   — gather + transpose, folded into buckets with cheap xor
  gather_add    — gather + transpose + where + ec_add (production body)
  prod          — production bucket_accumulate (includes grid build/sorts)
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
import numpy as np
import random
from functools import partial

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fj
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_jax import ec_add
from bulletproofs_tpu.ops.ec_host import G1


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
    N = 1 << 16
    C = 8
    R = 400          # static round count ~ production
    rnd = random.Random(0xBE7C)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rnd) for _ in range(256)]
        pts = base * (N // 256)
        P = ej.to_device_points(pts, ctx)          # (3, L, n)
        vals = [rnd.randrange(BLS381.r) for _ in range(N)]
        s = jnp.asarray(fj.ints_to_limbs(vals, ctx.fr.L))
        L = ctx.fp.L
        W = -(-ctx.cv.fr.n_bits // C)
        B = 1 << C

        digits = fj.get_digits(s, C, W)
        plan = msm_mod.window_plan(ctx, C)
        grid, found, occ = jax.jit(
            msm_mod._slot_grid, static_argnums=(1, 2))(digits, B, R,
                                                       *plan)
        print(f"W={W} B={B} R={R} occ={int(occ)}", flush=True)

        points_rows = jnp.transpose(P, (2, 0, 1)).reshape(N, 3 * L)
        identity = ctx.identity
        buckets0 = ctx.identity_like((1, W, B))

        # ---- grid build alone ----
        t = timeit(jax.jit(msm_mod._slot_grid, static_argnums=(1, 2)),
                   digits, B, R, *plan)
        print(f"grid_build: {t*1e3:.1f} ms", flush=True)

        # ---- add-only: constant delta ----
        @jax.jit
        def add_only(buckets, delta):
            def body(t, b):
                return ec_add(b, delta, ctx)
            return jax.lax.fori_loop(0, R, body, buckets)
        delta_c = jnp.broadcast_to(
            P[:, :, :1, None, None], (3, L, 1, W, B)) + 0
        t = timeit(add_only, buckets0, delta_c)
        print(f"add_only   : {t*1e3:.1f} ms total, {t/R*1e6:.0f} us/round "
              f"({R*W*B/t/1e6:.1f} M adds/s)", flush=True)

        # ---- gather-only ----
        @jax.jit
        def gather_only(grid, found, buckets):
            g4 = grid.reshape(R, 1, W, B)
            f4 = found.reshape(R, 1, W, B)
            def body(t, b):
                pid = jnp.minimum(g4[t], N - 1)
                rows = points_rows[pid.reshape(-1)]
                pts_ = rows.reshape(1, W, B, 3, L).transpose(3, 4, 0, 1, 2)
                delta = jnp.where(f4[t][None, None], pts_,
                                  identity.reshape(3, -1, 1, 1, 1))
                return b ^ delta        # cheap combine, keeps gather live
            return jax.lax.fori_loop(0, R, body, buckets)
        t = timeit(gather_only, grid, found, buckets0)
        print(f"gather_only: {t*1e3:.1f} ms total, {t/R*1e6:.0f} us/round",
              flush=True)

        # ---- production body ----
        @jax.jit
        def gather_add(grid, found, buckets):
            g4 = grid.reshape(R, 1, W, B)
            f4 = found.reshape(R, 1, W, B)
            def body(t, b):
                pid = jnp.minimum(g4[t], N - 1)
                rows = points_rows[pid.reshape(-1)]
                pts_ = rows.reshape(1, W, B, 3, L).transpose(3, 4, 0, 1, 2)
                delta = jnp.where(f4[t][None, None], pts_,
                                  identity.reshape(3, -1, 1, 1, 1))
                return ec_add(b, delta, ctx)
            return jax.lax.fori_loop(0, R, body, buckets)
        t = timeit(gather_add, grid, found, buckets0)
        print(f"gather_add : {t*1e3:.1f} ms total, {t/R*1e6:.0f} us/round",
              flush=True)

        # ---- production accumulate (incl. grid) ----
        @partial(jax.jit, static_argnums=(2,))
        def prod(points, digits, n_rounds):
            b, occ = msm_mod.bucket_accumulate(
                points, digits, ctx, C, n_rounds, plan=plan)
            return b
        t = timeit(prod, P, digits, R)
        print(f"production : {t*1e3:.1f} ms total", flush=True)

        # ---- combine ----
        buckets = prod(P, digits, R)
        t = timeit(jax.jit(lambda b: msm_mod.bucket_rowcol(b, ctx, C)),
                   buckets)
        print(f"rowcol     : {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
