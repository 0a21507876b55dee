"""Device (JAX/TPU) multi-scalar multiplication: uniform-work Pippenger.

TPU-native replacement for the reference's variable-time serial MSMs
(`G1Vector::inner_product_var_time_with_ref_vecs` at
`/root/reference/src/ipp.rs:91,104,158,170` and the verifier mega-check
`/root/reference/src/r1cs/verifier.rs:451`).  Var-time tricks (skip zero
scalars, per-point branching) don't vectorize, so this is a fixed-shape,
branch-free formulation (SURVEY.md section 2.3):

1. **Digits**: base-2^c unsigned digit decomposition of all scalars, all
   windows at once (integer ops on 16-bit limbs).
2. **Rank-round bucket accumulation**: within each window, points falling in
   the same bucket are given ranks 0,1,2,... (computed with one integer sort +
   cummax — no EC math).  Round t scatter-adds the rank-t point of every
   bucket into the bucket array — by construction collision-free, so each
   round is ONE batched complete EC add over all (window, bucket) pairs.
   Rounds needed = max bucket occupancy (~n/2^c * (1 + small tail)), so total
   EC work is ~(max/mean occupancy) * n per window — near the Pippenger ideal
   while every step is a full-width vector op.
3. **Bucket combine**: sum_d d*B_d computed per window via the two-level
   decomposition d = g*K + k:  sum_d d*B_d = K*(sum_g g*rowsum_g)
   + sum_k k*colsum_k — two short sequential running-sum loops of width
   W x 2^(c/2) instead of a 2^c-long serial chain.
4. **Window combine**: Horner over windows (c doublings + 1 add each).

Layouts keep the wide axis last (TPU lanes): buckets are (3, L, W, B).
"""

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import field_jax as fj
from .ec_jax import CurveCtx, ec_add, ec_double, to_device_points, \
    to_device_scalars, from_device_points


def _ec_kernel_choice():
    """BP_EC_KERNEL in {auto, pallas, pallas_round, xla}: auto uses the
    round-CHUNKED fused Mosaic kernel on real TPU hardware (R_c rounds per
    launch, buckets VMEM-resident across the chunk), plain XLA elsewhere
    (pallas TPU kernels don't lower on the CPU test mesh).  pallas_round
    keeps the one-launch-per-round kernel for A/B."""
    import os
    mode = os.environ.get("BP_EC_KERNEL", "auto")
    if mode in ("pallas", "pallas_round", "xla"):
        return mode
    # the tunneled TPU plugin registers as "axon"; anything non-CPU is a
    # real TPU target where Mosaic lowers
    return "xla" if jax.default_backend() == "cpu" else "pallas"


def _chunk_rounds(n_rounds):
    """Rounds per pallas launch (BP_EC_CHUNK, default 16 — occupancy
    guesses and escalations are already multiples of 16)."""
    import os
    R_c = int(os.environ.get("BP_EC_CHUNK", "16"))
    while n_rounds % R_c:
        R_c //= 2
    return max(R_c, 1)


def pick_window(n: int) -> int:
    """Even window size.  Larger c costs more combine work (~2*2^c/window)
    but fewer sequential rounds (round depth = max bucket occupancy
    ~ n/2^c * (1 + tail)); on TPU the per-round overhead makes shallow-and-
    wide win, but past B=256 the slot-grid and combine overheads regress
    (measured on v5e: c=8 beats c=10 by 11x at n=2^16)."""
    if n >= 4096:
        return 8
    if n >= 512:
        return 6
    if n >= 64:
        return 4
    return 2


# ---------------------------------------------------------------------------
# Phase 2: bucket accumulation (the EC hot loop)
# ---------------------------------------------------------------------------

def window_plan(ctx, c, n_sets=1, dup=False):
    """STATIC per-(curve, c) window layout with sub-bucket splitting.

    The top window's digits span only `range_w = (r-1 >> c*w) + 1` values
    (the scalar field order's top bits have low entropy), so with plain
    bucketing its occupancy — and therefore the GLOBAL round count — is
    B/range_w times worse than the uniform windows (measured 840 vs ~336
    rounds at n=2^16, c=8 on v5e).  Skewed windows therefore spread each
    digit over `split_w` sub-buckets (the otherwise-unused bucket indices):
    point with digit d and occupancy-rank t goes to bucket d + range_w *
    (t mod split_w) at round t // split_w.  A log2(split)-step EC fold
    before the combine restores true buckets.

    Returns (ranges, splits): numpy (n_sets*W, 1) int32 column vectors.

    dup=True additionally returns a DUPLICATE-ROW plan for windows whose
    split still can't fill the buckets (range*split in (B/2, B]): the
    residual occupancy skew B/(range*split) (1.10x for bls381 c=8) would
    otherwise set the GLOBAL round count.  Such windows get g-1 extra
    physical bucket rows; `bucket_accumulate` spreads their points over
    the g rows by index residue and EC-folds the rows back before the
    combine — per-row occupancy drops under the uniform windows' mean, so
    rounds are set by the uniform windows (368 -> 336 at n=2^16, c=8).
    Return shape: (ranges, splits, dup_plan) with the extra rows' ranges/
    splits APPENDED (after all sets) in dup_plan iteration order; dup_plan
    is a static list of (src_row, g).
    """
    B = 1 << c
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    r_max = ctx.cv.r - 1
    ranges, splits = [], []
    for w in range(W):
        rng = min(B, (r_max >> (c * w)) + 1)
        split = 1
        while split * 2 * rng <= B:
            split *= 2
        ranges.append(rng)
        splits.append(split)
    ranges_full = list(ranges) * n_sets
    splits_full = list(splits) * n_sets
    if not dup:
        return (np.asarray(ranges_full, np.int32).reshape(-1, 1),
                np.asarray(splits_full, np.int32).reshape(-1, 1))
    dup_plan = []
    for s in range(n_sets):
        for w in range(W):
            ratio = B / (ranges[w] * splits[w])
            if ratio > 1.04:
                g = int(np.ceil(ratio))
                dup_plan.append((s * W + w, g))
    for src, g in dup_plan:
        ranges_full += [ranges_full[src]] * (g - 1)
        splits_full += [splits_full[src]] * (g - 1)
    return (np.asarray(ranges_full, np.int32).reshape(-1, 1),
            np.asarray(splits_full, np.int32).reshape(-1, 1),
            tuple(dup_plan))


def _slot_grid(digits, B, R, ranges=None, splits=None):
    """Precompute the full round plan as a dense grid: grid[t, w, b] = index
    of the point that lands in bucket b of window w during round t (or n if
    that slot is empty), shape (R, W, B) int32 + found mask.

    Built from two sorts and NO scatters (TPU scatters serialize) and NO
    per-round dynamic slicing (slicing big lane-major arrays at traced
    offsets lowers to O(n) work per round):

    1. per point: slot key = occupancy-rank * B + bucket, where bucket =
       digit + range * (rank mod split) spreads skewed windows over their
       unused bucket indices (see `window_plan`)
    2. merge-sort real points with one dummy entry per slot
       (key doubled, dummies odd -> stable real-before-dummy)
    3. keep the first element of every key (real if present), compact the
       kept elements to the front with a second sort: the result is
       slot-ordered, exactly R*B long -> reshape.
    """
    W, n = digits.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
    sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=-1)
    prev = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), sorted_d[:, :-1]], axis=1)
    start_pos = jax.lax.cummax(
        jnp.where(sorted_d != prev, iota, 0), axis=1)
    rank = iota - start_pos
    return _slot_grid_from(sorted_d, rank, perm, B, R, ranges, splits, n)


def _slot_grid_from(sorted_d, rank, values, B, R, ranges, splits, n):
    """Grid construction from a precomputed (sorted digit, rank, value)
    triple — `values` are what the bucket loop gathers by (original point
    ids, or sorted positions when pre-reduction reordered the table)."""
    W = sorted_d.shape[0]
    if splits is not None:
        bucket = sorted_d + jnp.asarray(ranges) * (rank % jnp.asarray(splits))
        rank = rank // jnp.asarray(splits)
    else:
        bucket = sorted_d

    # true max occupancy under this plan (digit-0 never scheduled) — callers
    # verify their static R against it and re-dispatch on overflow
    occ = jnp.max(jnp.where(sorted_d == 0, 0, rank)) + 1

    # digit-0 points contribute weight 0: never schedule them (their key
    # sorts past every dummy); rank/round pressure comes from b != 0 only.
    # rank >= R is also sentineled so an undersized R can't alias valid
    # slots (the occupancy check above catches the drop).
    real_key = jnp.where((sorted_d == 0) | (rank >= R),
                         jnp.int32(2 * (R * B + 1)),
                         (rank * B + bucket) * 2)
    dummy_key = jnp.broadcast_to(
        jnp.arange(R * B, dtype=jnp.int32) * 2 + 1, (W, R * B))
    dummy_ids = jnp.full((W, R * B), n, jnp.int32)
    k = jnp.concatenate([real_key, dummy_key], axis=1)
    v = jnp.concatenate([values, dummy_ids], axis=1)
    k, v = jax.lax.sort((k, v), dimension=-1, num_keys=1)

    slot = k >> 1
    prev_slot = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), slot[:, :-1]], axis=1)
    first = slot != prev_slot
    total = k.shape[1]
    pos_iota = jnp.broadcast_to(jnp.arange(total, dtype=jnp.int32),
                                (W, total))
    compact_key = jnp.where(first, pos_iota, total)
    _, grid = jax.lax.sort((compact_key, v), dimension=-1, num_keys=1)
    grid = grid[:, :R * B].reshape(W, R, B).transpose(1, 0, 2)
    return grid, grid != n, occ                          # (R, W, B)


def fold_split_buckets(buckets, ctx, ranges, splits):
    """Undo the sub-bucket spreading: for every window with split > 1, EC-
    fold bucket d + range*j into bucket d (sequential over the j sub-ranges,
    which are ragged), identity elsewhere.  buckets (3, L, W, B) -> same
    shape with true per-digit buckets.  Only the (few) split windows are
    touched; untouched window runs pass through as whole slices."""
    B = buckets.shape[3]
    W = buckets.shape[2]
    if int(splits.max()) == 1:
        return buckets
    pieces = []
    done = 0
    for w in range(W):
        s, rng = int(splits[w, 0]), int(ranges[w, 0])
        if s == 1:
            continue
        if w > done:
            pieces.append(buckets[:, :, done:w])
        col = buckets[:, :, w]                       # (3, L, B)
        acc = col[..., :rng]
        for j in range(1, s):
            acc = ec_add(acc, col[..., j * rng:(j + 1) * rng], ctx)
        pieces.append(jnp.concatenate(
            [acc, ctx.identity_like((B - rng,))], axis=-1)[:, :, None])
        done = w + 1
    if done < W:
        pieces.append(buckets[:, :, done:])
    return jnp.concatenate(pieces, axis=2)


def _fold_dup_rows(buckets, ctx, dup_plan, W_base):
    """EC-fold the duplicate bucket rows (appended past W_base) back into
    their source windows and strip them: (3, L, W', B) -> (3, L, W_base, B).
    Static python loop — dup rows are one or two per scalar set."""
    if not dup_plan:
        return buckets
    base = buckets[:, :, :W_base]
    extra = buckets[:, :, W_base:]
    k = 0
    for src, g in dup_plan:
        acc = base[:, :, src]
        for _ in range(g - 1):
            acc = ec_add(acc, extra[:, :, k], ctx)
            k += 1
        base = jnp.concatenate(
            [base[:, :, :src], acc[:, :, None], base[:, :, src + 1:]],
            axis=2)
    return base


def bucket_accumulate(points, digits, ctx: CurveCtx, c: int, n_rounds=None,
                      k_slices=1, plan=None, pre_reduce=0, affine=False):
    """points (3, L, n) Montgomery, digits (W, n) -> (buckets (3, L, W, B),
    occ) where occ is the true max occupancy under `plan` after
    `pre_reduce` passes (callers verify n_rounds >= occ and re-dispatch
    with more rounds or more passes on the rare overflow).

    n_rounds: STATIC round count.  Static bounds + a precomputed slot grid
    keep every round O(K*W*B): one row index on the grid's major axis, one
    row gather from the point table, one batched complete EC add.

    plan: optional (ranges, splits) from `window_plan` — sub-bucket
    splitting for low-entropy windows (the field order's top bits), without
    which the top window inflates the GLOBAL round count ~2.5x.

    pre_reduce: k passes of pairwise same-bucket merging over the digit-
    sorted point table BEFORE scheduling — each pass is ONE full-width
    shifted EC add that halves every bucket's occupancy, so ANY scalar
    distribution (e.g. bit-vector witnesses, where thousands of points
    share one bucket and plain rank-rounds would need occupancy-many
    rounds) is tamed to ~uniform round counts at a cost of k*W*n adds.
    k > 0 materializes per-window sorted point copies ((3, L, W, n)).

    k_slices: K consecutive rounds per loop iteration against K independent
    bucket arrays (merged with a log2(K) tree at the end).  MEASURED: K=8
    regresses 2.4x at n=2^16 (the 5-D gather/transpose traffic beats the
    loop savings) — default stays 1; kept for future re-tuning.
    """
    assert n_rounds is not None, \
        "bucket_accumulate requires a static round count"
    B = 1 << c
    L = points.shape[1]
    n = points.shape[2]
    K = k_slices
    while n_rounds % K:
        K //= 2
    if plan is None:
        ranges = splits = None
        dup_plan = ()
    else:
        ranges, splits = plan[0], plan[1]
        dup_plan = plan[2] if len(plan) > 2 else ()
    W_base = digits.shape[0]
    if dup_plan:
        # spread each dup'd window's points over g physical rows by index
        # residue (see window_plan): digit-0 entries are never scheduled,
        # so masking to 0 removes a point from a row for free
        iota_n = jnp.arange(n, dtype=digits.dtype)
        rows = [digits[i] for i in range(W_base)]
        extra = []
        for src, g in dup_plan:
            grp = iota_n % g
            src_digits = rows[src]
            rows[src] = jnp.where(grp == 0, src_digits, 0)
            for j in range(1, g):
                extra.append(jnp.where(grp == j, src_digits, 0))
        digits = jnp.stack(rows + extra, axis=0)
    W = digits.shape[0]
    identity = ctx.identity

    if pre_reduce:
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
        sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=-1)
        prev = jnp.concatenate(
            [jnp.full((W, 1), -1, jnp.int32), sorted_d[:, :-1]], axis=1)
        start_pos = jax.lax.cummax(
            jnp.where(sorted_d != prev, iota, 0), axis=1)
        rank = iota - start_pos

        rows = jnp.transpose(points, (2, 0, 1)).reshape(n, 3 * L)
        P = rows[perm.reshape(-1)].reshape(W, n, 3, L)
        P = jnp.transpose(P, (2, 3, 0, 1))          # (3, L, W, n)
        id_col = identity.reshape(3, L, 1, 1)
        for p in range(pre_reduce):
            shift = 1 << p
            d_next = jnp.concatenate(
                [sorted_d[:, shift:], jnp.full((W, shift), -1, jnp.int32)],
                axis=1)
            P_next = jnp.concatenate(
                [P[..., shift:], jnp.broadcast_to(
                    id_col, (3, L, W, shift))], axis=-1)
            mergeable = ((rank & ((2 << p) - 1)) == 0) & \
                (d_next == sorted_d) & (sorted_d != 0)
            merged = ec_add(P, P_next, ctx)
            P = jnp.where(mergeable[None, None], merged, P)
        # survivors: rank multiple of 2^k; everything else never scheduled
        alive = (rank & ((1 << pre_reduce) - 1)) == 0
        eff_d = jnp.where(alive, sorted_d, 0)
        eff_rank = rank >> pre_reduce
        grid, found, occ = _slot_grid_from(
            eff_d, eff_rank, iota, B, n_rounds, ranges, splits, n)
        # per-window sorted tables: flat row index = w*n + sorted position
        points_rows = jnp.transpose(P, (2, 3, 0, 1)).reshape(W * n, 3 * L)
        w_off = (jnp.arange(W, dtype=jnp.int32) * n).reshape(1, W, 1)
    else:
        grid, found, occ = _slot_grid(digits, B, n_rounds, ranges, splits)
        points_rows = jnp.transpose(points, (2, 0, 1)).reshape(n, 3 * L)
        w_off = None

    grid = grid.reshape(n_rounds // K, K, W, B)
    found = found.reshape(n_rounds // K, K, W, B)
    buckets0 = ctx.identity_like((K, W, B))

    # Fused Mosaic kernels (ops/ec_pallas.py): gathered rows feed a pallas
    # kernel doing transpose + identity-mask + complete add with all
    # intermediates VMEM-resident.  The round-CHUNKED form (default) runs
    # R_c rounds per launch with the bucket accumulators VMEM-resident
    # across the chunk — one launch + one bucket HBM round-trip per chunk
    # instead of per round.  pallas_round keeps the per-round kernel
    # (measured 523 vs 723 us/round vs XLA at the n=2^16 shape, round 3).
    # XLA fallback: CPU tests, ed25519 (a != 0), odd slot counts.
    choice = _ec_kernel_choice()
    use_pallas = choice in ("pallas", "pallas_round") and K == 1
    if use_pallas:
        from .ec_pallas import bucket_round_supported
        use_pallas = bucket_round_supported(ctx, W * B)

    if use_pallas and choice == "pallas":
        from .ec_pallas import (bucket_rounds_chunk_pallas,
                                bucket_rounds_chunk_pallas_mixed)

        S = W * B
        R_c = _chunk_rounds(n_rounds)
        n_chunks = n_rounds // R_c
        grid_c = grid.reshape(n_chunks, R_c, W, B)
        found_c = found.reshape(n_chunks, R_c, S)
        # Mixed-add fast path: rows straight from an AFFINE table (Z == 1
        # guaranteed by the caller; pre-reduce passes merge rows into
        # projective points, so they disqualify) carry only (X, Y) — 2L
        # columns instead of 3L — and the kernel runs the 11-mul complete
        # mixed add (RCB16 alg 8) with empty-slot post-select.
        # BP_MSM_MIXED=0 is the hardware kill-switch (falls back to the
        # proven general chunked kernel).
        mixed = (affine and pre_reduce == 0
                 and os.environ.get("BP_MSM_MIXED", "1") != "0")
        if mixed:
            points_rows = jnp.transpose(
                points[:2], (2, 0, 1)).reshape(n, 2 * L)

        def chunk_body(ci, buckets):
            pid = jnp.minimum(jax.lax.dynamic_index_in_dim(
                grid_c, ci, 0, keepdims=False), n - 1)     # (R_c, W, B)
            if w_off is not None:
                pid = pid + w_off[None]
            rows = points_rows[pid.reshape(-1)]      # (R_c*S, 3L | 2L)
            fnd = jax.lax.dynamic_index_in_dim(
                found_c, ci, 0, keepdims=False)            # (R_c, S)
            if mixed:
                return bucket_rounds_chunk_pallas_mixed(buckets, rows,
                                                        fnd, ctx)
            return bucket_rounds_chunk_pallas(buckets, rows, fnd, ctx)

        buckets = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                    buckets0.reshape(3, L, S))
        buckets = buckets.reshape(3, L, 1, W, B)[:, :, 0]
        if plan is not None:
            buckets = fold_split_buckets(buckets, ctx, ranges, splits)
        buckets = _fold_dup_rows(buckets, ctx, dup_plan, W_base)
        # occ comes from the slot grid, not the kernel
        return buckets, occ

    if use_pallas:
        from .ec_pallas import bucket_round_add_pallas

        def body(t, buckets):
            pid = jnp.minimum(grid[t], n - 1)      # (1, W, B)
            if w_off is not None:
                pid = pid + w_off[None]
            rows = points_rows[pid.reshape(-1)]    # (S, 3L)
            out = bucket_round_add_pallas(
                buckets.reshape(3, L, W * B), rows,
                found[t].reshape(-1), ctx)
            return out.reshape(buckets.shape)
    else:
        def body(t, buckets):
            pid = jnp.minimum(grid[t], n - 1)      # (K, W, B)
            ok = found[t]
            if w_off is not None:
                pid = pid + w_off[None]
            rows = points_rows[pid.reshape(-1)]
            pts = rows.reshape(K, W, B, 3, L).transpose(3, 4, 0, 1, 2)
            delta = jnp.where(ok[None, None], pts,
                              identity.reshape(3, -1, 1, 1, 1))
            return ec_add(buckets, delta, ctx)

    buckets = jax.lax.fori_loop(0, n_rounds // K, body, buckets0)
    # merge the K slices: halving tree of (.., K/2^s, W, B) adds
    while K > 1:
        K //= 2
        buckets = ec_add(buckets[:, :, :K], buckets[:, :, K:], ctx)
    buckets = buckets[:, :, 0]
    if plan is not None:
        buckets = fold_split_buckets(buckets, ctx, ranges, splits)
    buckets = _fold_dup_rows(buckets, ctx, dup_plan, W_base)
    return buckets, occ


@partial(jax.jit, static_argnums=(1, 2))
def _max_occupancy(scalars, ctx: CurveCtx, c: int):
    """Max NON-ZERO bucket occupancy over all windows under the split plan
    (used by the sharded MSM to fix a global static round count).  Digit-0
    points are never scheduled (weight 0), so they don't add rounds."""
    W = -(-ctx.cv.fr.n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    n = digits.shape[1]
    ranges, splits = window_plan(ctx, c)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
    sorted_d, _ = jax.lax.sort_key_val(digits, iota, dimension=-1)
    prev = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), sorted_d[:, :-1]], axis=1)
    start_pos = jax.lax.cummax(
        jnp.where(sorted_d != prev, iota, 0), axis=1)
    rank = (iota - start_pos) // jnp.asarray(splits)
    rank = jnp.where(sorted_d == 0, 0, rank)
    return jnp.max(rank) + 1


# ---------------------------------------------------------------------------
# Phase 3+4: bucket & window combine
# ---------------------------------------------------------------------------

def _running_weighted_sum(arr, m, ctx):
    """arr (3, L, *batch, m) -> sum_{j} j * arr[..., j] over the LAST axis,
    via the classic descending running-sum (sum of suffixes)."""
    shape = arr.shape[2:-1]
    running = ctx.identity_like(shape)
    total = ctx.identity_like(shape)

    def body(t, carry):
        running, total = carry
        j = m - 1 - t
        running = ec_add(
            running, jax.lax.dynamic_index_in_dim(arr, j, axis=arr.ndim - 1,
                                                  keepdims=False), ctx)
        total = ec_add(total, running, ctx)
        return running, total

    _, total = jax.lax.fori_loop(0, m - 1, body, (running, total))
    return total


def _axis_sum(arr, m, axis, ctx):
    """Plain EC sum over `axis` (length m) via sequential fori."""
    acc = ctx.identity_like(arr.shape[2:axis] + arr.shape[axis + 1:])

    def body(j, acc):
        return ec_add(acc, jax.lax.dynamic_index_in_dim(
            arr, j, axis=axis, keepdims=False), ctx)

    return jax.lax.fori_loop(0, m, body, acc)


def bucket_rowcol(buckets, ctx: CurveCtx, c: int):
    """The WIDE half of the bucket combine: two-level split d = g*K + k,
    rowsum[w, g] = sum_k B[w, gK+k], colsum[w, k] = sum_g B[w, gK+k].
    buckets (3, L, W, B) -> ((3, L, W, G), (3, L, W, K)).

    The serial tail (weighted running sums + window Horner) either stays on
    device (`combine_from_rowcol`, for the pure-device/sharded paths) or is
    finished by the native C++ host runtime (`msm_hybrid` — ~300 sequential
    single-point adds are latency-bound on the TPU but microseconds on the
    host, and every MSM result crosses to the host for the transcript
    anyway)."""
    g_bits = (c + 1) // 2
    G, K = 1 << g_bits, 1 << (c - g_bits)
    bk = buckets.reshape(buckets.shape[:3] + (G, K))
    rowsum = _axis_sum(bk, K, 4, ctx)             # (3, L, W, G): sum over k
    colsum = _axis_sum(bk, G, 3, ctx)             # (3, L, W, K): sum over g
    return rowsum, colsum


def window_totals(rowsum, colsum, ctx: CurveCtx, c: int):
    """Per-window totals T_w = K*(sum_g g*rowsum) + sum_k k*colsum.
    The weighted running sums are short sequential chains (G-1 and K-1
    steps) but run PARALLEL across all windows — ~35 latency-bound steps
    total, independent of n.  (3, L, W, G/K) -> (3, L, W)."""
    G, K = rowsum.shape[3], colsum.shape[3]
    wr = _running_weighted_sum(rowsum, G, ctx)    # sum_g g*rowsum (3, L, W)
    wc = _running_weighted_sum(colsum, K, ctx)    # sum_k k*colsum (3, L, W)
    for _ in range(c - (c + 1) // 2):             # K * wr
        wr = ec_double(wr, ctx)
    return ec_add(wr, wc, ctx)                    # (3, L, W)


def combine_from_rowcol(rowsum, colsum, ctx: CurveCtx, c: int,
                        wins_per_set=None):
    """Device serial tail of the combine.  rowsum (3, L, W, G), colsum
    (3, L, W, K); W = n_sets * wins_per_set windows -> (3, L, n_sets)."""
    W = rowsum.shape[2]
    if wins_per_set is None:
        wins_per_set = W
    n_sets = W // wins_per_set
    totals = window_totals(rowsum, colsum, ctx, c)
    totals = totals.reshape(totals.shape[:2] + (n_sets, wins_per_set))

    # Horner over each set's windows: acc = 2^c * acc + T_w, w = Wps-1 .. 0
    def body(t, acc):
        w = wins_per_set - 1 - t
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ec_double(a, ctx), acc)
        return ec_add(acc, jax.lax.dynamic_index_in_dim(
            totals, w, axis=3, keepdims=False), ctx)

    return jax.lax.fori_loop(0, wins_per_set, body,
                             ctx.identity_like((n_sets,)))


def combine_buckets(buckets, ctx: CurveCtx, c: int):
    """buckets (3, L, W, B) -> MSM total (3, L, 1) single point."""
    rowsum, colsum = bucket_rowcol(buckets, ctx, c)
    return combine_from_rowcol(rowsum, colsum, ctx, c)


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def _use_dup():
    """BP_MSM_DUP gates the duplicate-row scheduling for residual-skew
    windows (default on; proofs are schedule-independent, bit-identical)."""
    import os
    return os.environ.get("BP_MSM_DUP", "1") != "0"


def occupancy_guess(n, ctx, c, margin_sigma=4.0, dup=None):
    """STATIC round-count guess: worst per-window mean occupancy under the
    split (+ duplicate-row) plan plus a Poisson tail margin, rounded to a
    multiple of 16 (a handful of distinct values keeps the jit cache warm).
    The kernels return the true occupancy; drivers re-dispatch on the rare
    overflow.  `dup` must match the plan the caller will accumulate under
    (None = the production BP_MSM_DUP default; sharded paths pass False)."""
    import math
    if dup is None:
        dup = _use_dup()
    plan = window_plan(ctx, c, dup=dup)
    ranges, splits = plan[0], plan[1]
    n_rows = ranges.shape[0]
    row_n = [n] * n_rows
    if len(plan) > 2:
        k = n_rows - sum(g - 1 for _, g in plan[2])
        for src, g in plan[2]:
            row_n[src] = -(-n // g)
            for _ in range(g - 1):
                row_n[k] = -(-n // g)
                k += 1
    worst = max(-(-row_n[i] // (int(ranges[i, 0]) * int(splits[i, 0])))
                for i in range(n_rows))
    guess = worst + margin_sigma * math.sqrt(worst) + 4
    return max(16, (int(guess) + 15) // 16 * 16)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _msm_device_jit(points, scalars, ctx: CurveCtx, c: int, n_rounds,
                    pre_reduce=0, affine=False):
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    plan = window_plan(ctx, c, dup=_use_dup())
    buckets, occ = bucket_accumulate(points, digits, ctx, c, n_rounds,
                                     plan=plan, pre_reduce=pre_reduce,
                                     affine=affine)
    return combine_buckets(buckets, ctx, c), occ


def _digits_multi(scalars, ctx, c):
    """scalars (S, Lr, n) -> (S*W, n) digits (each set's windows stacked)."""
    S = scalars.shape[0]
    W = -(-ctx.cv.fr.n_bits // c)
    digs = [fj.get_digits(scalars[s], c, W) for s in range(S)]
    return jnp.concatenate(digs, axis=0)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _msm_multi_totals_jit(points, scalars, ctx: CurveCtx, c: int, n_rounds,
                          pre_reduce=0, affine=False):
    """S scalar sets against one point vector in ONE bucket pass (the two
    L/R MSMs of an IPA round share the point table and the round grid).
    Returns (per-window totals (3, L, S*W) in PLAIN form, occ) as ONE
    fetch.  The weighted bucket sums run on device (window-parallel short
    chains, `window_totals`); only W points per set cross to the host —
    32x fewer bytes than fetching the rowcol sums (round-3 profile: the
    rowcol fetch was ~3 s of a 4 s warm prove through the ~12 MB/s device
    tunnel).  The serial Horner finishes on the native host runtime."""
    S = scalars.shape[0]
    digits = _digits_multi(scalars, ctx, c)
    plan = window_plan(ctx, c, n_sets=S, dup=_use_dup())
    buckets, occ = bucket_accumulate(points, digits, ctx, c, n_rounds,
                                     plan=plan, pre_reduce=pre_reduce,
                                     affine=affine)
    rowsum, colsum = bucket_rowcol(buckets, ctx, c)
    totals = window_totals(rowsum, colsum, ctx, c)       # (3, L, S*W)
    L = ctx.fp.L
    m = totals.shape[2]
    # Montgomery -> plain for the host ABI (limbs must lead for the kernel)
    limbs_first = jnp.transpose(totals, (1, 0, 2)).reshape(L, 3 * m)
    plain = fj.mont_mul(limbs_first,
                        jnp.zeros_like(limbs_first).at[0].set(1), ctx.fp)
    return jnp.transpose(plain.reshape(L, 3, m), (1, 0, 2)), occ


@partial(jax.jit, static_argnums=(2, 3, 4))
def _msm_multi_device_jit(points, scalars, ctx: CurveCtx, c: int, n_rounds):
    """Pure-device multi-set MSM: scalars (S, Lr, n) -> ((3, L, S), occ)."""
    S = scalars.shape[0]
    W = -(-ctx.cv.fr.n_bits // c)
    digits = _digits_multi(scalars, ctx, c)
    plan = window_plan(ctx, c, n_sets=S, dup=_use_dup())
    buckets, occ = bucket_accumulate(points, digits, ctx, c, n_rounds,
                                     plan=plan)
    rowsum, colsum = bucket_rowcol(buckets, ctx, c)
    return combine_from_rowcol(rowsum, colsum, ctx, c, wins_per_set=W), occ


def msm_hybrid(points_dev, scalars_multi, ctx: CurveCtx, c: int = None,
               n_eff: int = None, affine: bool = False):
    """Multi-set MSM with the serial combine tail on the native host:
    points (3, L, n) Montgomery device, scalars (S, Lr, n) plain device ->
    list of S host G1 results.

    This is the production prover/verifier MSM: results cross to the host
    for the Fiat-Shamir transcript anyway, so finishing the ~300-step
    serial combine there (microseconds in C++) instead of on the TPU
    (latency-bound fori chains) is strictly cheaper.

    n_eff: caller's bound on NON-ZERO scalars per set (the implicit-basis
    IPA masks half of each vector to zero) — tightens the round guess."""
    import numpy as np
    from .cpp_backend import _CurveABI, get_lib, _ptr
    import ctypes

    from .prover_device import _timed

    n = points_dev.shape[2]
    S = scalars_multi.shape[0]
    if c is None:
        c = pick_window(n)
    W = -(-ctx.cv.fr.n_bits // c)
    # start from the last successful escalation for this shape: witness
    # MSMs (bit-vector scalars) need pre-reduction EVERY time — rediscovering
    # it per call would run a wasted underscheduled kernel first
    key = (n, S, c, ctx.cv.name, n_eff)
    rounds, pre = _escalation_memo.get(
        key, (occupancy_guess(n_eff or n, ctx, c), 0))
    while True:
        with _timed("msm_kernel"):
            totals_dev, occ_dev = _msm_multi_totals_jit(
                points_dev, scalars_multi, ctx, c, rounds, pre, affine)
        with _timed("msm_transfer"):
            # ONE device->host fetch for (totals, occupancy): a separate
            # occupancy sync costs a full extra tunnel round trip per MSM
            totals, occ = jax.device_get((totals_dev, occ_dev))
            occ = int(occ)
        if occ <= rounds:
            break
        rounds, pre = _escalate(occ, rounds, pre)
    _escalation_memo[key] = (rounds, pre)

    with _timed("msm_host_combine"):
        abi = _CurveABI(ctx.cv)
        lib = get_lib()
        out = np.zeros(S * 3 * abi.Lp, dtype=np.uint64)
        lib.bp_combine_totals(
            _ptr(abi.params), _ptr(_limbs16_to_limbs64(totals, abi.Lp)),
            ctypes.c_uint64(S * W), ctypes.c_uint64(c),
            ctypes.c_uint64(W), _ptr(out))
        return abi.buf_to_points(out, S)


def _limbs16_to_limbs64(arr, Lp64):
    """(3, L16, m) uint32 16-bit limbs (plain form) -> C ABI buffer of m
    points x 3 coords x Lp64 64-bit limbs (pure numpy bit repacking)."""
    import numpy as np
    arr = np.asarray(arr, dtype=np.uint16)       # canonical 16-bit limbs
    three, L16, m = arr.shape
    # -> (m, 3, L16) little-endian u16 words, padded to Lp64*4 words
    words = np.transpose(arr, (2, 0, 1))
    pad = Lp64 * 4 - L16
    if pad:
        words = np.concatenate(
            [words, np.zeros((m, 3, pad), np.uint16)], axis=2)
    return np.ascontiguousarray(words).view(np.uint64).reshape(-1)


def msm_device(points, scalars, ctx: CurveCtx, c: int, affine=False):
    """points (3, L, n) Montgomery, scalars (Lr, n) plain limbs -> (3, L, 1).

    Guess-and-verify round count: the STATIC round count comes from the
    input-independent `occupancy_guess` (so one compiled kernel serves all
    inputs of a shape), the kernel reports the true occupancy, and an
    overflow re-dispatches — degenerate distributions (many equal scalars)
    escalate to pre-reduction passes instead of more rounds."""
    rounds = occupancy_guess(points.shape[2], ctx, c)
    pre = 0
    while True:
        out, occ = _msm_device_jit(points, scalars, ctx, c, rounds, pre,
                                   affine)
        occ = int(occ)
        if occ <= rounds:
            return out
        rounds, pre = _escalate(occ, rounds, pre)


_escalation_memo = {}


def _escalate(occ, rounds, pre):
    """Overflow policy: mild overflow (tail event) grows the round count;
    large overflow (degenerate repeated scalars) adds halving passes until
    the projected occupancy fits."""
    if occ <= 2 * rounds:
        return (occ + 15) // 16 * 16, pre
    import math
    extra = math.ceil(math.log2(occ / rounds))
    return rounds, pre + extra


def msm(points, scalars, cv=None):
    """Host wrapper: list[G1] x list[Scalar] -> G1 (one device round trip)."""
    from .ec_jax import to_device_points_affine
    assert len(points) == len(scalars) and points
    ctx = CurveCtx(cv or points[0].cv)
    P, affine = to_device_points_affine(points, ctx)
    s = to_device_scalars(scalars, ctx)
    c = pick_window(len(points))
    out = msm_device(P, s, ctx, c, affine=affine)
    return from_device_points(out, ctx)[0]


# ---------------------------------------------------------------------------
# Barrier-seeded combine tail (fused-IPA workaround)
#
# HARDWARE ERRATUM (round 4, see NOTES.md): inside the one-dispatch fused
# IPA program the fori_loop-based combine tail (`_axis_sum`,
# `_running_weighted_sum`, the window Horner) returns corrupted points on
# the real TPU, while the very same buckets verify bit-exact against host
# EC ground truth and the very same combine code is bit-exact when jitted
# standalone (scripts/hw_fused_probe.py staged verdicts: scal2 OK, digits
# OK, slot grid OK, bucket sums OK, combine output WRONG; identical wrong
# bytes under the pallas AND pure-XLA bucket kernels, so the corruption is
# in the shared XLA tail, not a kernel).  The signature matches a loop-
# carry/constant aliasing miscompile once the program contains many nested
# fori_loops seeded from the same broadcast-identity constant.
#
# Round 4 tried PYTHON-UNROLLING the whole tail (no fori carries at all):
# byte-identical on CPU, but the ~400 EC add/double bodies instantiated
# TWICE (round 0 + the round loop) made the fused n=2048 program
# uncompilable through the axon tunnel (>30 min, round-5 race timeout).
# These variants instead keep the compact fori forms and break only the
# suspected aliasing surface: every loop seed goes through
# `lax.optimization_barrier`, so the carry's initial buffer is a fresh op
# result rather than a shared broadcast-identity constant that XLA may
# alias across the program's many loop instances.  Op order and algebra
# are identical -> byte-identical results.  Only the fused path uses
# them; the per-round/standalone paths keep the plain fori forms
# (hardware-proven there).
# ---------------------------------------------------------------------------

def _ident_seed(ctx, shape):
    """Identity accumulator seed with a barrier: not constant-foldable,
    not aliasable with other instances of the same broadcast constant."""
    return jax.lax.optimization_barrier(ctx.identity_like(shape))


def _axis_sum_fused(arr, m, axis, ctx):
    """`_axis_sum` with a barrier-seeded carry and the indexed array
    THREADED THROUGH the loop carry: a dynamic-slice of a loop-INVARIANT
    operand inside the fused program's nested loops is the suspected
    miscompile surface (round-5 hw verdict: barrier seeds alone did not
    fix it), so the operand rides the loop state instead of being hoisted
    as an invariant capture."""
    acc = _ident_seed(ctx, arr.shape[2:axis] + arr.shape[axis + 1:])

    def body(j, carry):
        arr, acc = carry
        return arr, ec_add(acc, jax.lax.dynamic_index_in_dim(
            arr, j, axis=axis, keepdims=False), ctx)

    _, acc = jax.lax.fori_loop(0, m, body, (arr, acc))
    return acc


def _running_weighted_sum_fused(arr, m, ctx):
    """`_running_weighted_sum` with barrier-seeded carries and the indexed
    array threaded through the loop carry (see `_axis_sum_fused`)."""
    shape = arr.shape[2:-1]
    running = _ident_seed(ctx, shape)
    total = _ident_seed(ctx, shape)

    def body(t, carry):
        arr, running, total = carry
        j = m - 1 - t
        running = ec_add(
            running, jax.lax.dynamic_index_in_dim(arr, j, axis=arr.ndim - 1,
                                                  keepdims=False), ctx)
        total = ec_add(total, running, ctx)
        return arr, running, total

    _, _, total = jax.lax.fori_loop(0, m - 1, body, (arr, running, total))
    return total


def combine_from_rowcol_fused(rowsum, colsum, ctx, c, wins_per_set=None):
    """`combine_from_rowcol` with barrier'd stage boundaries, barrier-seeded
    loop carries, and loop-carried operands.  Same algebra and op order ->
    byte-identical points."""
    rowsum, colsum = jax.lax.optimization_barrier((rowsum, colsum))
    W = rowsum.shape[2]
    if wins_per_set is None:
        wins_per_set = W
    n_sets = W // wins_per_set
    G, K = rowsum.shape[3], colsum.shape[3]
    wr = _running_weighted_sum_fused(rowsum, G, ctx)
    wc = _running_weighted_sum_fused(colsum, K, ctx)
    for _ in range(c - (c + 1) // 2):
        wr = ec_double(wr, ctx)
    totals = ec_add(wr, wc, ctx)                       # (3, L, W)
    totals = totals.reshape(totals.shape[:2] + (n_sets, wins_per_set))
    totals = jax.lax.optimization_barrier(totals)

    def body(t, carry):
        totals, acc = carry
        w = wins_per_set - 1 - t
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ec_double(a, ctx), acc)
        return totals, ec_add(acc, jax.lax.dynamic_index_in_dim(
            totals, w, axis=3, keepdims=False), ctx)

    _, out = jax.lax.fori_loop(0, wins_per_set, body,
                               (totals, _ident_seed(ctx, (n_sets,))))
    return out


def bucket_rowcol_fused(buckets, ctx, c):
    """`bucket_rowcol` with a barrier'd input and carried-operand axis sums
    (fused combine head)."""
    buckets = jax.lax.optimization_barrier(buckets)
    g_bits = (c + 1) // 2
    G, K = 1 << g_bits, 1 << (c - g_bits)
    bk = buckets.reshape(buckets.shape[:3] + (G, K))
    rowsum = _axis_sum_fused(bk, K, 4, ctx)
    colsum = _axis_sum_fused(bk, G, 3, ctx)
    return rowsum, colsum
