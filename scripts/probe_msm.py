"""TPU probe: measure the MSM phase breakdown and candidate primitives.

Run ON THE REAL TPU (JAX_PLATFORMS default = axon).  Writes timings to
stdout; drives the round-2 MSM optimization choices (sort replacement,
window retune, combine restructure).  Usage:
    python scripts/probe_msm.py [n_log2]
"""

import json
import os
import sys
import time

os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp
import random
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fj
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_host import G1


def bench(fn, *args, reps=3, name=""):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"PROBE {name}: p50={med*1e3:.2f} ms  compile={compile_s:.1f} s",
          flush=True)
    return med


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = 1 << n_log2
    c = 8
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        L = ctx.fp.L
        rnd = random.Random(0xBE7C)
        base = [G1.random(rnd) for _ in range(256)]
        P = ej.to_device_points(base * (N // 256), ctx)
        npr = np.random.RandomState(0)
        sl = npr.randint(0, 1 << 16, size=(ctx.fr.L, N)).astype(np.uint32)
        sl[ctx.fr.L - 1] %= 0x73ED
        s = jnp.asarray(sl)
        W = -(-ctx.cv.fr.n_bits // c)
        B = 1 << c

        print(f"device={jax.devices()[0]} n=2^{n_log2} c={c} W={W} B={B}",
              flush=True)

        # -- 0. full MSM (current) --
        rounds = (int(msm_mod._max_occupancy(s, ctx, c)) + 7) // 8 * 8
        print(f"rounds={rounds}", flush=True)
        t_full = bench(lambda: msm_mod._msm_device_jit(P, s, ctx, c, rounds),
                       name="msm_full_c8")

        # -- 1. digits + slot grid alone --
        @partial(jax.jit, static_argnums=())
        def grid_only():
            digits = fj.get_digits(s, c, W)
            grid, found = msm_mod._slot_grid(digits, B, rounds)
            return grid.sum() + found.sum()
        t_grid = bench(grid_only, name="slot_grid")

        # -- 2. bucket rounds alone (grid precomputed, donate) --
        digits = jax.jit(lambda: fj.get_digits(s, c, W))()
        @jax.jit
        def buckets_only(P, digits):
            return msm_mod.bucket_accumulate(P, digits, ctx, c, rounds)
        t_buckets = bench(buckets_only, P, digits, name="bucket_rounds")
        buckets = buckets_only(P, digits)

        # -- 3. combine alone --
        @jax.jit
        def combine_only(b):
            return msm_mod.combine_buckets(b, ctx, c)
        t_combine = bench(combine_only, buckets, name="combine")

        # -- 4. one batched ec_add at the bucket width --
        delta = ctx.identity_like((W, B))
        @jax.jit
        def one_add(b, d):
            return ej.ec_add(b, d, ctx)
        t_add = bench(one_add, buckets, delta, reps=5, name="ec_add_WxB")
        print(f"PROBE ec_add_throughput: {W*B/t_add/1e6:.2f} M adds/s",
              flush=True)

        # -- 5. lax.sort pair over (W, n + R*B) --
        total = N + rounds * B
        k0 = jnp.asarray(
            npr.randint(0, 2 * rounds * B, size=(W, total)).astype(np.int32))
        v0 = jnp.asarray(
            npr.randint(0, N, size=(W, total)).astype(np.int32))
        @jax.jit
        def pair_sort(k, v):
            return jax.lax.sort((k, v), dimension=-1, num_keys=1)
        t_sort = bench(pair_sort, k0, v0, name=f"pair_sort_{W}x{total}")

        # -- 6. minor-axis gather: (W, R*B) indices into (W, N) --
        idx = jnp.asarray(
            npr.randint(0, N, size=(W, rounds * B)).astype(np.int32))
        tbl = v0[:, :N]
        @jax.jit
        def minor_gather(t, i):
            return jnp.take_along_axis(t, i, axis=1)
        t_gather = bench(minor_gather, tbl, idx, name="minor_gather")

        # -- 7. vmapped searchsorted (W rows, B queries) --
        sorted_tbl = jnp.sort(tbl, axis=1)
        queries = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32), (W, B))
        @jax.jit
        def vss(t, q):
            return jax.vmap(jnp.searchsorted)(t, q)
        t_ss = bench(vss, sorted_tbl, queries, name="searchsorted")

        # -- 8. single-key sort (is the pair the cost?) --
        @jax.jit
        def single_sort(k):
            return jax.lax.sort(k, dimension=-1)
        t_sort1 = bench(single_sort, k0, name=f"single_sort_{W}x{total}")

        # -- 9. mont_mul throughput at ec_add-equivalent width --
        a = jnp.asarray(npr.randint(0, 1 << 16,
                                    size=(L, 6, W * B)).astype(np.uint32))
        @jax.jit
        def mm(a):
            return fj.mont_mul(a, a, ctx.fp)
        t_mm = bench(mm, a, reps=5, name="mont_mul_6wide")
        print(f"PROBE mont_mul_throughput: {6*W*B/t_mm/1e6:.2f} M muls/s",
              flush=True)

        # -- 10. full MSM at c=10 (retune check) --
        c10 = 10
        W10 = -(-ctx.cv.fr.n_bits // c10)
        r10 = (int(msm_mod._max_occupancy(s, ctx, c10)) + 7) // 8 * 8
        print(f"c10 rounds={r10}", flush=True)
        t_c10 = bench(lambda: msm_mod._msm_device_jit(P, s, ctx, c10, r10),
                      name="msm_full_c10")

        print(json.dumps({
            "n": N, "c": c, "rounds": rounds,
            "msm_full_s": t_full, "slot_grid_s": t_grid,
            "bucket_rounds_s": t_buckets, "combine_s": t_combine,
            "pair_sort_s": t_sort, "single_sort_s": t_sort1,
            "minor_gather_s": t_gather, "searchsorted_s": t_ss,
            "msm_c10_s": t_c10,
        }), flush=True)


if __name__ == "__main__":
    main()
