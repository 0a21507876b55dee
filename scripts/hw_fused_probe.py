"""Composed-program probe for the fused-IPA hardware corruption.

Every round-0 stage is correct when jitted STANDALONE on hardware
(tpu_fused_debug.py round0/mixed/combine stages), and the garbage L bytes
are byte-identical between the general-pallas and pure-XLA bucket kernels
— so the corruption is upstream of the bucket kernel and only manifests
inside the COMPOSED one-dispatch program.  This probe runs the real fused
structure (round 0 + the rounds-2..lg n fori_loop) but additionally
returns round 0's internal intermediates, then verifies each against
python-int ground truth:

  scal2 (scalar build) -> LR (MSM + device combine) -> pb (serialization)

Usage: python scripts/hw_fused_probe.py [n] [--noloop]
  --noloop drops the fori_loop from the probe program (round 0 only) to
  test whether the loop's presence corrupts the round-0 computation.
"""

import os
import sys

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
from bulletproofs_tpu.ops import prover_device as pd
from bulletproofs_tpu.ops.transcript_device import (DeviceTranscript,
                                                    serialize_points)
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14))
def _probe_jit(state, pts, A, B, rG, rH, ctx, c, n_rounds, affine,
               lg_n, pos, pos_begin, cur_flags, with_loop):
    """_ipa_fused_jit with round-0 intermediates exported."""
    fr = ctx.fr
    W = -(-ctx.cv.fr.n_bits // c)
    plan = msm_mod.window_plan(ctx, c, n_sets=2, dup=msm_mod._use_dup())
    PB = 2 * ctx.cv.modbytes + 1

    def msm_round(scal2, deep=False):
        digits = msm_mod._digits_multi(scal2, ctx, c)
        buckets, occ = msm_mod.bucket_accumulate(
            pts, digits, ctx, c, n_rounds, plan=plan, affine=affine)
        rowsum, colsum = msm_mod.bucket_rowcol(buckets, ctx, c)
        LR = msm_mod.combine_from_rowcol(rowsum, colsum, ctx, c,
                                         wins_per_set=W)
        if deep:
            # replicate bucket_accumulate's dup-spread + slot grid so the
            # exported grid is the SAME subgraph XLA CSEs internally
            ranges, splits = plan[0], plan[1]
            dup_plan = plan[2] if len(plan) > 2 else ()
            dd = digits
            if dup_plan:
                iota_n = jnp.arange(dd.shape[1], dtype=dd.dtype)
                rows_l = [dd[i] for i in range(dd.shape[0])]
                extra = []
                for src, g in dup_plan:
                    grp = iota_n % g
                    src_digits = rows_l[src]
                    rows_l[src] = jnp.where(grp == 0, src_digits, 0)
                    for j in range(1, g):
                        extra.append(jnp.where(grp == j, src_digits, 0))
                dd = jnp.stack(rows_l + extra, axis=0)
            grid, found, _ = msm_mod._slot_grid(dd, 1 << c, n_rounds,
                                                ranges, splits)
            return LR, occ, digits, buckets, grid, found
        return LR, occ

    def round_core(t, A, B, rG, rH, jj, deep=False):
        scal2 = pd._ipa_round_scalars_traced(A, B, rG, rH, jj, lg_n, fr)
        if deep:
            LR, occ, digits, buckets, grid, found = msm_round(scal2,
                                                              deep=True)
        else:
            LR, occ = msm_round(scal2)
            digits = buckets = grid = found = None
        pb = serialize_points(LR, ctx)
        t.commit_point_bytes(b"L", pb[0])
        t.commit_point_bytes(b"R", pb[1])
        u_m = t.challenge_scalar_mont(b"u", ctx)
        u_inv_m = fj.inv_mont(u_m, fr)
        A, B, rG, rH = pd._ipa_round_update_traced(A, B, rG, rH, u_m,
                                                   u_inv_m, jj, lg_n, fr)
        return (A, B, rG, rH, pb, occ, scal2, LR, u_m, digits, buckets,
                grid, found)

    t = DeviceTranscript.from_snapshot(state, pos, pos_begin, cur_flags)
    (A, B, rG, rH, pb0, occ_max, scal2_r0, LR_r0, u0, digits_r0,
     buckets_r0, grid_r0, found_r0) = round_core(t, A, B, rG, rH,
                                                 jnp.int32(0), deep=True)
    lr = jnp.zeros((lg_n, 2, PB), jnp.uint32).at[0].set(pb0)
    st = t.strobe.st
    inv_regs = (t.strobe.pos, t.strobe.pos_begin, t.strobe.cur_flags)

    if with_loop and lg_n > 1:
        def body(jj, carry):
            A, B, rG, rH, st, lr, occ_max = carry
            tt = DeviceTranscript.from_snapshot(st, *inv_regs)
            A, B, rG, rH, pb, occ = round_core(tt, A, B, rG, rH, jj)[:6]
            lr = jax.lax.dynamic_update_slice(
                lr, pb[None], (jj, jnp.int32(0), jnp.int32(0)))
            return (A, B, rG, rH, tt.strobe.st, lr,
                    jnp.maximum(occ_max, occ))

        A, B, rG, rH, st, lr, occ_max = jax.lax.fori_loop(
            1, lg_n, body, (A, B, rG, rH, st, lr, occ_max))

    return (lr, occ_max, scal2_r0, LR_r0, pb0, u0, digits_r0, buckets_r0,
            grid_r0, found_r0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 2048
    with_loop = "--noloop" not in sys.argv
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        fr = ctx.fr
        r = ctx.cv.r
        rng = random.Random(3)
        G = get_generators("G", n)
        H = get_generators("H", n)
        Q = G1.from_msg_hash(b"Q")
        one = Scalar.one()
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        table = G + H + [Q]
        dev, aff = ej.to_device_points_affine(table, ctx)
        pts = jnp.concatenate([dev, jnp.asarray(ctx.identity)], axis=2)
        A = pd._mont(fr, a)
        B = pd._mont(fr, b)
        rG = pd._mont(fr, [one] * n)
        rH = pd._mont(fr, [one] * n)
        lg_n = n.bit_length() - 1

        transcript = ProofTranscript(b"probe")
        transcript.innerproduct_domain_sep(n)
        snap, pos, pb_, fl = DeviceTranscript.snapshot(transcript)
        c = msm_mod.pick_window(2 * n + 2)
        rounds = msm_mod.occupancy_guess(n + 1, ctx, c)

        while True:
            out = _probe_jit(jnp.asarray(snap), pts, A, B, rG, rH, ctx, c,
                             rounds, True, lg_n, pos, pb_, fl, with_loop)
            (lr_np, occ, scal2_np, LR_np, pb0_np, u0_np, digits_np,
             buckets_np, grid_np, found_np) = jax.device_get(out)
            print(f"probe n={n} loop={with_loop} occ={int(occ)} "
                  f"rounds={rounds}", flush=True)
            if int(occ) <= rounds:
                break
            # occupancy overflow: bucket points beyond `rounds` were
            # silently dropped — every downstream MISMATCH would be a
            # SOFTWARE overflow, not the hardware erratum.  Re-dispatch
            # with the rounded-up count, as the production path does
            # (ADVICE r4).
            print(f"  WARNING: occupancy {int(occ)} > rounds {rounds}; "
                  f"re-running with rounds rounded up", flush=True)
            rounds = (int(occ) + 15) // 16 * 16

        # ---- ground truth (python ints) ----
        half = n // 2
        av = [s.v for s in a]
        bv = [s.v for s in b]
        sGL = [0] * half + av[:half]
        sHL = bv[half:] + [0] * half
        cL = sum(av[i] * bv[i + half] for i in range(half)) % r
        sGR = av[half:] + [0] * half
        sHR = [0] * half + bv[:half]
        cR = sum(av[i + half] * bv[i] for i in range(half)) % r
        want_L = sGL + sHL + [cL, 0]
        want_R = sGR + sHR + [cR, 0]

        got_L = fj.limbs_to_ints(scal2_np[0])
        got_R = fj.limbs_to_ints(scal2_np[1])
        ok = got_L == want_L and got_R == want_R
        print(f"round0 scal2 vs ground truth: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            for name, got, want in (("L", got_L, want_L),
                                    ("R", got_R, want_R)):
                bad = [i for i in range(len(want)) if got[i] != want[i]]
                if bad:
                    print(f"  {name}: {len(bad)} bad lanes, first at "
                          f"{bad[0]} (got {got[bad[0]]:#x} want "
                          f"{want[bad[0]]:#x})", flush=True)

        # ---- digits vs python ground truth ----
        B_buckets = 1 << c
        W = -(-ctx.cv.fr.n_bits // c)
        want_digits = np.zeros((2 * W, 2 * n + 2), np.int32)
        for s, want in enumerate((want_L, want_R)):
            for w in range(W):
                for i, v in enumerate(want):
                    want_digits[s * W + w, i] = (v >> (c * w)) & \
                        (B_buckets - 1)
        okd = bool((digits_np == want_digits).all())
        print(f"round0 digits vs ground truth: "
              f"{'OK' if okd else 'MISMATCH'}", flush=True)
        if not okd:
            bad = np.argwhere(digits_np != want_digits)
            print(f"  {len(bad)} bad entries, first at {bad[0]}",
                  flush=True)

        # ---- slot grid vs numpy emulation on the FETCHED digits ----
        plan = msm_mod.window_plan(ctx, c, n_sets=2,
                                   dup=msm_mod._use_dup())
        ranges_p, splits_p = plan[0], plan[1]
        dup_plan = plan[2] if len(plan) > 2 else ()
        dd = [digits_np[i].copy() for i in range(digits_np.shape[0])]
        nn = digits_np.shape[1]
        iota_n = np.arange(nn)
        extra = []
        for src, g in dup_plan:
            grp = iota_n % g
            src_digits = dd[src].copy()
            dd[src] = np.where(grp == 0, src_digits, 0)
            for j in range(1, g):
                extra.append(np.where(grp == j, src_digits, 0).astype(
                    np.int32))
        dd = np.stack(dd + extra, axis=0)
        Wp = dd.shape[0]
        want_grid = np.full((rounds, Wp, B_buckets), nn, np.int32)
        occ_emul = 0
        for w in range(Wp):
            order = np.argsort(dd[w], kind="stable")
            sd = dd[w][order]
            rng_w, spl_w = int(ranges_p[w, 0]), int(splits_p[w, 0])
            run_start = 0
            for pos_i in range(nn):
                if pos_i and sd[pos_i] != sd[pos_i - 1]:
                    run_start = pos_i
                d = int(sd[pos_i])
                if d == 0:
                    continue
                rank = pos_i - run_start
                bkt = d + rng_w * (rank % spl_w)
                rnd = rank // spl_w
                occ_emul = max(occ_emul, rnd + 1)
                if rnd < rounds:
                    want_grid[rnd, w, bkt] = order[pos_i]
        okg = bool((grid_np == want_grid).all())
        print(f"round0 slot grid vs numpy emulation: "
              f"{'OK' if okg else 'MISMATCH'} (emul occ={occ_emul})",
              flush=True)
        if not okg:
            bad = np.argwhere(grid_np != want_grid)
            t0, w0, b0 = bad[0]
            print(f"  {len(bad)} bad slots, first at round={t0} w={w0} "
                  f"b={b0}: got {grid_np[t0, w0, b0]} want "
                  f"{want_grid[t0, w0, b0]}", flush=True)
        okf = bool((found_np == (want_grid != nn)).all())
        print(f"round0 found mask: {'OK' if okf else 'MISMATCH'}",
              flush=True)

        # ---- bucket sums vs host EC accumulation of the ground truth ----
        table_id_pts = table + [G1.identity()]
        w_base = 2 * W
        want_buckets = [[G1.identity() for _ in range(B_buckets)]
                        for _ in range(w_base)]
        for s, want in enumerate((want_L, want_R)):
            for w in range(W):
                for i, v in enumerate(want):
                    d = (v >> (c * w)) & (B_buckets - 1)
                    if d:
                        row = want_buckets[s * W + w]
                        row[d] = row[d] + table_id_pts[i]
        got_buckets = ej.from_device_points(
            jnp.asarray(buckets_np).reshape(3, buckets_np.shape[1], -1),
            ctx)
        okb = True
        first_bad = None
        for w in range(w_base):
            for d in range(B_buckets):
                gpt = got_buckets[w * B_buckets + d]
                wpt = want_buckets[w][d]
                if gpt.to_bytes() != wpt.to_bytes():
                    okb = False
                    if first_bad is None:
                        first_bad = (w, d)
        print(f"round0 bucket sums vs ground truth: "
              f"{'OK' if okb else 'MISMATCH'}"
              + (f" (first bad w={first_bad[0]} d={first_bad[1]})"
                 if first_bad else ""), flush=True)

        # ---- MSM ground truth ----
        table_id = table + [G1.identity()]
        wL = msm_host(table_id, [Scalar(v) for v in want_L])
        wR = msm_host(table_id, [Scalar(v) for v in want_R])
        got_pts = ej.from_device_points(jnp.asarray(LR_np), ctx)
        okm = (got_pts[0].to_bytes() == wL.to_bytes()
               and got_pts[1].to_bytes() == wR.to_bytes())
        print(f"round0 MSM result vs ground truth: "
              f"{'OK' if okm else 'MISMATCH'}", flush=True)

        # ---- serialization ----
        oks = (bytes(pb0_np[0].astype(np.uint8)) == wL.to_bytes()
               and bytes(pb0_np[1].astype(np.uint8)) == wR.to_bytes())
        print(f"round0 pb bytes vs ground truth: "
              f"{'OK' if oks else 'MISMATCH'}", flush=True)

        # ---- challenge ----
        transcript.commit_point(b"L", wL)
        transcript.commit_point(b"R", wR)
        want_u = transcript.challenge_scalar(b"u").v
        got_u = fr.from_mont(jnp.asarray(u0_np))[0]
        print(f"round0 challenge vs ground truth: "
              f"{'OK' if got_u == want_u else 'MISMATCH'}", flush=True)

        # ---- lr[0] vs pb0 (did the loop overwrite slot 0?) ----
        same = bool((lr_np[0] == pb0_np).all())
        print(f"lr[0] == pb0: {'OK' if same else 'OVERWRITTEN'}",
              flush=True)


if __name__ == "__main__":
    main()
