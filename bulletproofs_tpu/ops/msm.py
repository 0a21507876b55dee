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

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import field_jax as fj
from .ec_jax import CurveCtx, ec_add, ec_double, to_device_points, \
    to_device_scalars, from_device_points


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

def _slot_grid(digits, B, R):
    """Precompute the full round plan as a dense grid: grid[t, w, b] = index
    of the point that lands in bucket b of window w during round t (or n if
    that slot is empty), shape (R, W, B) int32 + found mask.

    Built from two sorts and NO scatters (TPU scatters serialize) and NO
    per-round dynamic slicing (slicing big lane-major arrays at traced
    offsets lowers to O(n) work per round):

    1. per point: slot key = occupancy-rank * B + digit
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

    # digit-0 points contribute weight 0: never schedule them (their key
    # sorts past every dummy); rank/round pressure comes from b != 0 only.
    # rank >= R is also sentineled so an undersized R (caller contract
    # violation) can't alias valid slots — callers compute R from the true
    # max occupancy.
    real_key = jnp.where((sorted_d == 0) | (rank >= R),
                         jnp.int32(2 * (R * B + 1)),
                         (rank * B + sorted_d) * 2)
    dummy_key = jnp.broadcast_to(
        jnp.arange(R * B, dtype=jnp.int32) * 2 + 1, (W, R * B))
    dummy_ids = jnp.full((W, R * B), n, jnp.int32)
    k = jnp.concatenate([real_key, dummy_key], axis=1)
    v = jnp.concatenate([perm, dummy_ids], axis=1)
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
    return grid, grid != n                               # (R, W, B)


def bucket_accumulate(points, digits, ctx: CurveCtx, c: int, n_rounds=None,
                      k_slices=1):
    """points (3, L, n) Montgomery, digits (W, n) -> buckets (3, L, W, B).

    n_rounds: STATIC round count (the top-level MSM computes max occupancy on
    the host and rounds up to a multiple of k_slices).  Static bounds + a
    precomputed slot grid keep every round O(K*W*B): one row index on the
    grid's major axis, one row gather from the point table, one batched
    complete EC add.

    k_slices: K consecutive rounds per loop iteration against K independent
    bucket arrays (merged with a log2(K) tree at the end).  MEASURED: K=8
    regresses 2.4x at n=2^16 (the 5-D gather/transpose traffic beats the
    loop savings) — default stays 1; kept for future re-tuning.
    """
    assert n_rounds is not None, \
        "bucket_accumulate requires a static round count"
    B = 1 << c
    W = digits.shape[0]
    L = points.shape[1]
    n = points.shape[2]
    K = k_slices
    while n_rounds % K:
        K //= 2
    grid, found = _slot_grid(digits, B, n_rounds)
    grid = grid.reshape(n_rounds // K, K, W, B)
    found = found.reshape(n_rounds // K, K, W, B)
    buckets0 = ctx.identity_like((K, W, B))
    identity = ctx.identity
    points_rows = jnp.transpose(points, (2, 0, 1)).reshape(n, 3 * L)

    def body(t, buckets):
        pid = grid[t]                              # (K, W, B)
        ok = found[t]
        rows = points_rows[jnp.minimum(pid, n - 1).reshape(-1)]
        pts = rows.reshape(K, W, B, 3, L).transpose(3, 4, 0, 1, 2)
        delta = jnp.where(ok[None, None], pts,
                          identity.reshape(3, -1, 1, 1, 1))
        return ec_add(buckets, delta, ctx)

    buckets = jax.lax.fori_loop(0, n_rounds // K, body, buckets0)
    # merge the K slices: halving tree of (.., K/2^s, W, B) adds
    while K > 1:
        K //= 2
        buckets = ec_add(buckets[:, :, :K], buckets[:, :, K:], ctx)
    return buckets[:, :, 0]


@partial(jax.jit, static_argnums=(1, 2))
def _max_occupancy(scalars, ctx: CurveCtx, c: int):
    """Max NON-ZERO bucket occupancy over all windows (tiny; synced to host
    by the MSM driver to fix the round count statically).  Digit-0 points
    are never scheduled (weight 0), so they don't add rounds."""
    W = -(-ctx.cv.fr.n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    n = digits.shape[1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
    sorted_d, _ = jax.lax.sort_key_val(digits, iota, dimension=-1)
    prev = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), sorted_d[:, :-1]], axis=1)
    start_pos = jax.lax.cummax(
        jnp.where(sorted_d != prev, iota, 0), axis=1)
    rank = jnp.where(sorted_d == 0, 0, iota - start_pos)
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


def combine_buckets(buckets, ctx: CurveCtx, c: int):
    """buckets (3, L, W, B) -> MSM total (3, L) single point."""
    W, B = buckets.shape[2], buckets.shape[3]
    g_bits = (c + 1) // 2
    G, K = 1 << g_bits, 1 << (c - g_bits)         # d = g*K + k
    bk = buckets.reshape(buckets.shape[:3] + (G, K))
    rowsum = _axis_sum(bk, K, 4, ctx)             # (3, L, W, G): sum over k
    colsum = _axis_sum(bk, G, 3, ctx)             # (3, L, W, K): sum over g
    wr = _running_weighted_sum(rowsum, G, ctx)    # sum_g g*rowsum (3, L, W)
    wc = _running_weighted_sum(colsum, K, ctx)    # sum_k k*colsum (3, L, W)
    for _ in range(c - g_bits):                   # K * wr
        wr = ec_double(wr, ctx)
    totals = ec_add(wr, wc, ctx)                  # (3, L, W)

    # Horner over windows: acc = 2^c * acc + T_w, w = W-1 .. 0
    # (single points keep a trailing batch dim of 1: batch is never empty)
    def body(t, acc):
        w = W - 1 - t
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ec_double(a, ctx), acc)
        return ec_add(acc, jax.lax.dynamic_index_in_dim(
            totals, w, axis=2, keepdims=True), ctx)

    return jax.lax.fori_loop(0, W, body, ctx.identity_like((1,)))


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2, 3, 4))
def _msm_device_jit(points, scalars, ctx: CurveCtx, c: int, n_rounds):
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    buckets = bucket_accumulate(points, digits, ctx, c, n_rounds)
    return combine_buckets(buckets, ctx, c)


def msm_device(points, scalars, ctx: CurveCtx, c: int):
    """points (3, L, n) Montgomery, scalars (Lr, n) plain limbs -> (3, L, 1).

    Two-step: a tiny jitted pass computes the max bucket occupancy, the host
    rounds it up to a multiple of 8 (so the handful of distinct values hit
    the jit cache), and the main kernel runs with a STATIC round count."""
    rounds = int(_max_occupancy(scalars, ctx, c))
    rounds = (rounds + 7) // 8 * 8
    return _msm_device_jit(points, scalars, ctx, c, rounds)


def msm(points, scalars, cv=None):
    """Host wrapper: list[G1] x list[Scalar] -> G1 (one device round trip)."""
    assert len(points) == len(scalars) and points
    ctx = CurveCtx(cv or points[0].cv)
    P = to_device_points(points, ctx)
    s = to_device_scalars(scalars, ctx)
    c = pick_window(len(points))
    out = msm_device(P, s, ctx, c)
    return from_device_points(out, ctx)[0]
