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
import jax.numpy as jnp

from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field_jax as fj
from ..ops import msm as msm_mod
from ..ops.ec_jax import CurveCtx, ec_add


AXIS = "shard"
HOST_AXIS = "host"
CHIP_AXIS = "chip"


def make_mesh(devices=None, axis=AXIS):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(n_hosts, chips_per_host, devices=None):
    """2-D (host, chip) mesh: the multi-host topology of the north star.
    The chip axis maps to intra-host ICI; the host axis to cross-host DCN.
    On the virtual CPU mesh both are simulated, but the COMMUNICATION
    STRUCTURE (hierarchical reduction, DCN-minimal message counts) is the
    real one and compiles identically."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_hosts * chips_per_host, \
        f"need {n_hosts * chips_per_host} devices, have {len(devices)}"
    grid = np.asarray(devices[:n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def _pad_to_multiple(points, scalars, ctx, d):
    """Pad the n axis with identity points / zero scalars to a multiple of
    the mesh size (zero scalars are never scheduled, so padding is free in
    bucket work; VERDICT r2 weak #6 — was an undocumented divisibility
    requirement)."""
    n = scalars.shape[-1]
    if n % d == 0:
        return points, scalars
    pad = d - n % d
    L = points.shape[1]
    id_pad = jnp.broadcast_to(ctx.identity.reshape(3, L, 1), (3, L, pad))
    points = jnp.concatenate([points, id_pad], axis=2)
    scalars = jnp.concatenate(
        [scalars, jnp.zeros(scalars.shape[:-1] + (pad,), scalars.dtype)],
        axis=-1)
    return points, scalars


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
                n_rounds=16, affine=False):
    """shard_map body: points (3, L, n_local), scalars (Lr, n_local) are the
    LOCAL shards; returns the replicated (3, L, 1) total.  affine=True
    opts into the mixed-add bucket kernel (the identity/zero padding from
    `_pad_to_multiple` is safe: zero scalars are never scheduled)."""
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    plan = msm_mod.window_plan(ctx, c)
    buckets, _ = msm_mod.bucket_accumulate(points, digits, ctx, c, n_rounds,
                                           plan=plan, affine=affine)
    buckets = _allreduce_buckets(buckets, ctx, axis)
    return msm_mod.combine_buckets(buckets, ctx, c)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _msm_sharded_jit(points, scalars, ctx, c, mesh, n_rounds, affine=False):
    body = partial(msm_sharded, ctx=ctx, c=c, axis=AXIS, n_rounds=n_rounds,
                   affine=affine)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, AXIS)),
        out_specs=P(None, None, None),
        check_vma=False,
    )(points, scalars)


def msm_sharded_jit(points, scalars, ctx: CurveCtx, c: int, mesh: Mesh,
                    affine=False):
    """points (3, L, n) / scalars (Lr, n) global arrays (any n — padded to
    the mesh size with identity/zero); output is the replicated MSM total
    (3, L, 1).

    The per-shard bucket round count is fixed STATICALLY (dynamic while
    bounds defeat XLA loop pipelining): the max occupancy over all shards is
    computed with a tiny jitted pass and rounded up to a multiple of 8, so
    imbalanced/degenerate shards raise the GLOBAL round count rather than
    dropping points."""
    d = mesh.devices.size
    points, scalars = _pad_to_multiple(points, scalars, ctx, d)
    n = scalars.shape[-1]
    ns = n // d
    rounds = 0
    for k in range(d):
        rounds = max(rounds, int(msm_mod._max_occupancy(
            scalars[:, k * ns:(k + 1) * ns], ctx, c)))
    rounds = (rounds + 7) // 8 * 8
    return _msm_sharded_jit(points, scalars, ctx, c, mesh, rounds, affine)


# ---------------------------------------------------------------------------
# 2-D (host x chip) hierarchical variant — the multi-host axis (SURVEY §2.3)
# ---------------------------------------------------------------------------

def msm_sharded_2d(points, scalars, ctx: CurveCtx, c: int,
                   n_rounds=16, affine=False):
    """shard_map body on a (host, chip) mesh: local bucket accumulation,
    then HIERARCHICAL bucket reduction — butterfly over the chip axis first
    (intra-host ICI), then over the host axis (cross-host DCN).  The DCN
    stage moves log2(H) bucket arrays per chip instead of log2(H*C): the
    intra-host stage already folded each host's shards, which is the whole
    point of the 2-level topology (north star: >=80% scaling efficiency to
    N hosts; DCN bandwidth << ICI)."""
    n_bits = ctx.cv.fr.n_bits
    W = -(-n_bits // c)
    digits = fj.get_digits(scalars, c, W)
    plan = msm_mod.window_plan(ctx, c)
    buckets, _ = msm_mod.bucket_accumulate(points, digits, ctx, c, n_rounds,
                                           plan=plan, affine=affine)
    buckets = _allreduce_buckets(buckets, ctx, CHIP_AXIS)   # ICI stage
    buckets = _allreduce_buckets(buckets, ctx, HOST_AXIS)   # DCN stage
    return msm_mod.combine_buckets(buckets, ctx, c)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _msm_sharded_2d_jit(points, scalars, ctx, c, mesh, n_rounds,
                        affine=False):
    body = partial(msm_sharded_2d, ctx=ctx, c=c, n_rounds=n_rounds,
                   affine=affine)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, (HOST_AXIS, CHIP_AXIS)),
                  P(None, (HOST_AXIS, CHIP_AXIS))),
        out_specs=P(None, None, None),
        check_vma=False,
    )(points, scalars)


def msm_sharded_2d_jit(points, scalars, ctx: CurveCtx, c: int, mesh: Mesh,
                       affine=False):
    """2-D-mesh MSM: n sharded over host x chip jointly, hierarchical
    ICI-then-DCN bucket reduction.  Any n (padded)."""
    d = mesh.devices.size
    points, scalars = _pad_to_multiple(points, scalars, ctx, d)
    n = scalars.shape[-1]
    ns = n // d
    rounds = 0
    for k in range(d):
        rounds = max(rounds, int(msm_mod._max_occupancy(
            scalars[:, k * ns:(k + 1) * ns], ctx, c)))
    rounds = (rounds + 7) // 8 * 8
    return _msm_sharded_2d_jit(points, scalars, ctx, c, mesh, rounds, affine)
