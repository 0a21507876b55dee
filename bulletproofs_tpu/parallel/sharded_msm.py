"""Sharded Pippenger MSM over a jax device mesh.

Replaces the reference's serial variable-time MSM
(`/root/reference/src/ipp.rs:91,104`, `verifier.rs:451`) with the multi-chip
decomposition from the north star (SURVEY.md section 2.3):

- the point/scalar n-axis is sharded across the mesh ("shard" axis)
- each chip runs local rank-round bucket accumulation (ops/msm.py)
- bucket arrays (one per window x bucket, EC points) are reduced across chips
  with a butterfly of `lax.ppermute` exchanges + complete EC adds — the
  "collective bucket reduction" (EC addition is not an XLA psum reduction, so
  the butterfly IS our all-reduce, riding ICI)
- the cheap window/bucket combine then runs replicated on every chip.

Communication volume: log2(D) exchanges of the (3, L, W, 2^c) bucket array
(~2.4 MB for BLS12-381 at c=8) — independent of n.
"""

from functools import partial

import numpy as np

import jax

from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field_jax as fj
from ..ops import msm as msm_mod
from ..ops.ec_jax import CurveCtx, ec_add


AXIS = "shard"


def make_mesh(devices=None, axis=AXIS):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _allreduce_buckets(buckets, ctx, axis):
    """Butterfly all-reduce with EC addition over mesh axis `axis`."""
    size = jax.lax.axis_size(axis)
    assert size & (size - 1) == 0, "mesh axis size must be a power of two"
    k = 1
    while k < size:
        perm = [(i, i ^ k) for i in range(size)]
        received = jax.lax.ppermute(buckets, axis, perm)
        buckets = ec_add(buckets, received, ctx)
        k *= 2
    return buckets


def msm_sharded(points, scalars, ctx: CurveCtx, c: int, axis=AXIS,
                n_rounds=16):
    """shard_map body: points (3, L, n_local), scalars (Lr, n_local) are the
    LOCAL shards; returns the replicated (3, L, 1) total."""
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    plan = msm_mod.window_plan(ctx, c)
    buckets, _ = msm_mod.bucket_accumulate(points, digits, ctx, c, n_rounds,
                                           plan=plan)
    buckets = _allreduce_buckets(buckets, ctx, axis)
    return msm_mod.combine_buckets(buckets, ctx, c)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _msm_sharded_jit(points, scalars, ctx, c, mesh, n_rounds):
    body = partial(msm_sharded, ctx=ctx, c=c, axis=AXIS, n_rounds=n_rounds)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, AXIS)),
        out_specs=P(None, None, None),
        check_vma=False,
    )(points, scalars)


def msm_sharded_jit(points, scalars, ctx: CurveCtx, c: int, mesh: Mesh):
    """points (3, L, n) / scalars (Lr, n) global arrays, n divisible by the
    mesh size; output is the replicated MSM total (3, L, 1).

    The per-shard bucket round count is fixed STATICALLY (dynamic while
    bounds defeat XLA loop pipelining): the max occupancy over all shards is
    computed with a tiny jitted pass and rounded up to a multiple of 8."""
    n = scalars.shape[-1]
    d = mesh.devices.size
    ns = n // d
    rounds = 0
    for k in range(d):
        rounds = max(rounds, int(msm_mod._max_occupancy(
            scalars[:, k * ns:(k + 1) * ns], ctx, c)))
    rounds = (rounds + 7) // 8 * 8
    return _msm_sharded_jit(points, scalars, ctx, c, mesh, rounds)
