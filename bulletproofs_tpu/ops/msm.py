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
    wide win: keep occupancy around 32-64."""
    if n >= 32768:
        return 10
    if n >= 4096:
        return 8
    if n >= 512:
        return 6
    if n >= 64:
        return 4
    return 2


# ---------------------------------------------------------------------------
# Phase 1: integer-only round plan (sorts, ranks — no EC math)
# ---------------------------------------------------------------------------

def _round_plan(digits, B):
    """digits (W, n) int32 -> round-major (rank_ord, ids_ord, dig_ord) each
    (W, n+B) with a sentinel tail, plus max_rank (traced scalar).

    rank of a point within its bucket = its round index; within one round all
    active points of a window hit distinct buckets.  The round-major order is
    sorted by (rank, digit) so each round's run is digit-sorted: the bucket
    phase can then locate every bucket's point with a vectorized binary
    search + GATHER — no EC-payload scatter anywhere (XLA scatters serialize
    on TPU; gathers are fast).
    """
    W, n = digits.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n))
    sorted_d, perm = jax.lax.sort_key_val(digits, iota, dimension=-1)
    prev = jnp.concatenate(
        [jnp.full((W, 1), -1, jnp.int32), sorted_d[:, :-1]], axis=1)
    is_start = sorted_d != prev
    start_pos = jax.lax.cummax(
        jnp.where(is_start, iota, 0), axis=1)
    rank = iota - start_pos                       # occupancy rank, sorted order
    max_rank = jnp.max(rank)
    # round-major with digit as secondary key
    rank_ord, dig_ord, ids_ord = jax.lax.sort(
        (rank, sorted_d, perm), dimension=-1, num_keys=2)
    # sentinel tail so dynamic slices of width B never go OOB
    pad_r = jnp.full((W, B), n + 1, jnp.int32)
    pad_z = jnp.zeros((W, B), jnp.int32)
    return (jnp.concatenate([rank_ord, pad_r], axis=1),
            jnp.concatenate([ids_ord, pad_z], axis=1),
            jnp.concatenate([dig_ord, pad_z], axis=1),
            max_rank)


# ---------------------------------------------------------------------------
# Phase 2: bucket accumulation (the EC hot loop)
# ---------------------------------------------------------------------------

def bucket_accumulate(points, digits, ctx: CurveCtx, c: int, n_rounds=None):
    """points (3, L, n) Montgomery, digits (W, n) -> buckets (3, L, W, B).

    n_rounds: STATIC round count when known (top-level MSM computes
    max-occupancy on the host and rounds up — a dynamic while_loop bound
    defeats XLA's loop pipelining, measured ~19x slower per round).  When
    None (e.g. inside shard_map where a host sync is impossible) falls back
    to the dynamic bound.
    """
    B = 1 << c
    W = digits.shape[0]
    L = points.shape[1]
    rank_ord, ids_ord, dig_ord, max_rank = _round_plan(digits, B)
    buckets0 = ctx.identity_like((W, B))
    buckets_iota = jnp.arange(B, dtype=jnp.int32)
    identity = ctx.identity
    # row-major point table: per-round random access gathers ROWS (major
    # axis); gathering along the minor/lane axis lowers to O(n)-sized work
    # per round on TPU
    points_rows = jnp.transpose(points, (2, 0, 1)).reshape(
        points.shape[2], 3 * L)

    def one_window(rank_row, ids_row, dig_row, t):
        """Indices (pid, found) for round t of one window — gathers only."""
        s = jnp.searchsorted(rank_row, t, side="left")
        r = jax.lax.dynamic_slice_in_dim(rank_row, s, B)
        ids = jax.lax.dynamic_slice_in_dim(ids_row, s, B)
        dig = jax.lax.dynamic_slice_in_dim(dig_row, s, B)
        # mask entries beyond this round with an impossible digit, then give
        # every bucket b the position of its (unique, digit-sorted) point
        dq = jnp.where(r == t, dig, B + 1)
        pos = jnp.minimum(jnp.searchsorted(dq, buckets_iota, side="left"),
                          B - 1)
        found = dq[pos] == buckets_iota
        return ids[pos], found

    def body(t, buckets):
        pid, found = jax.vmap(one_window, in_axes=(0, 0, 0, None))(
            rank_ord, ids_ord, dig_ord, t)        # (W, B) each
        rows = points_rows[pid.reshape(-1)]       # (W*B, 3L) row gather
        pts = rows.reshape(W, B, 3, L).transpose(2, 3, 0, 1)
        delta = jnp.where(found[None, None], pts,
                          identity.reshape(3, -1, 1, 1))
        return ec_add(buckets, delta, ctx)

    bound = n_rounds if n_rounds is not None else max_rank + 1
    return jax.lax.fori_loop(0, bound, body, buckets0)


@partial(jax.jit, static_argnums=(1, 2))
def _max_occupancy(scalars, ctx: CurveCtx, c: int):
    """Max bucket occupancy over all windows (tiny; synced to host by the
    MSM driver to fix the round count statically)."""
    W = -(-ctx.cv.fr.n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    _, _, _, max_rank = _round_plan(digits, 1 << c)
    return max_rank + 1


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
