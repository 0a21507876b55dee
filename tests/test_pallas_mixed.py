"""Mixed-add chunked bucket kernel (ops/ec_pallas.py
bucket_rounds_chunk_pallas_mixed) vs the plain XLA masked-add math, via
pallas interpret mode.

The mixed form (RCB16 algorithm 8, Z2 == 1) produces DIFFERENT projective
representatives than the general add — comparisons are group equality, and
the end-to-end MSM (whose final combine normalizes) must byte-match the
host backend exactly.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.ops import ec_jax as ej


@pytest.fixture
def ctx():
    with using_curve(BLS381):
        yield ej.CurveCtx(BLS381)


def _bucket_points(arr, ctx):
    with using_curve(BLS381):
        return ej.from_device_points(arr, ctx)


def test_mixed_kernel_matches_xla_body(ctx, monkeypatch):
    """Random rounds incl. empty slots, identity accumulators (first-touch
    case) and a forced doubling (delta == accumulator)."""
    monkeypatch.setenv("BP_PALLAS_INTERPRET", "1")
    from bulletproofs_tpu.ops.ec_pallas import (
        bucket_rounds_chunk_pallas_mixed)

    rng = random.Random(99)
    n, S, R_c = 32, 128, 4
    L = ctx.fp.L

    with using_curve(BLS381):
        pts = [G1.from_msg_hash(bytes([i])) for i in range(n)]
        P, affine = ej.to_device_points_affine(pts, ctx)   # Z=1 table
        assert affine
        binit = [G1.from_msg_hash(b"b%d" % i) for i in range(S // 2)]
        # half the buckets start at the identity (the production initial
        # state), half at arbitrary points
        buckets = jnp.concatenate(
            [ej.to_device_points(binit, ctx),
             jnp.broadcast_to(jnp.asarray(ctx.identity).reshape(3, L, 1),
                              (3, L, S - S // 2))], axis=2)

    rows_xy = jnp.transpose(P[:2], (2, 0, 1)).reshape(n, 2 * L)
    rows_all = jnp.transpose(P, (2, 0, 1)).reshape(n, 3 * L)
    pid = np.array([[rng.randrange(n) for _ in range(S)]
                    for _ in range(R_c)], np.int32)
    # slot 0 of round 1: force a doubling (bucket == delta after round 0)
    pid[1][0] = pid[0][0]
    found = np.array([[rng.random() < 0.7 for _ in range(S)]
                      for _ in range(R_c)], np.int32)
    found[0][0] = found[1][0] = 1

    out = bucket_rounds_chunk_pallas_mixed(
        buckets, rows_xy[pid.reshape(-1)], jnp.asarray(found), ctx)

    # reference: general complete add with identity masking, plain XLA
    exp = buckets
    identity = ctx.identity
    for r in range(R_c):
        pts_r = rows_all[pid[r]].reshape(S, 3, L).transpose(1, 2, 0)
        ok = jnp.asarray(found[r])[None, None, :]
        delta = jnp.where(ok != 0, pts_r, identity.reshape(3, L, 1))
        exp = ej.ec_add(exp, delta, ctx)

    got_pts = _bucket_points(out, ctx)
    exp_pts = _bucket_points(exp, ctx)
    for i, (a, b) in enumerate(zip(got_pts, exp_pts)):
        assert a == b, f"bucket {i} diverged (group inequality)"


def test_mixed_msm_end_to_end_matches_host(ctx, monkeypatch):
    """Full _msm_device_jit with affine=True under BP_EC_KERNEL=pallas
    (interpret mode) must produce the host backend's exact result —
    exercises the 2L row gather, dup-row plan and combine plumbing."""
    monkeypatch.setenv("BP_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("BP_EC_KERNEL", "pallas")
    from bulletproofs_tpu.ops import msm as msm_mod

    rng = random.Random(4321)
    n = 64
    with using_curve(BLS381):
        pts = [G1.from_msg_hash(b"p%d" % i) for i in range(n)]
        scs = [Scalar.random(rng) for _ in range(n)]
        # degenerate values too: zero scalar, repeated point
        scs[3] = Scalar.zero()
        pts[5] = pts[4]
        expected = msm_host(pts, scs)

        P, affine = ej.to_device_points_affine(pts, ctx)
        assert affine
        s = ej.to_device_scalars(scs, ctx)
        c = 4
        rounds = n  # safe static bound
        out, occ = msm_mod._msm_device_jit(P, s, ctx, c, rounds,
                                           0, True)
        got = ej.from_device_points(out, ctx)[0]
    assert got == expected


def test_mixed_msm_hybrid_totals_path(ctx, monkeypatch):
    """Production prover route: msm_hybrid (device totals + native Horner
    combine) with the mixed chunked kernel, vs the host backend.  c=4
    keeps the slot count divisible by the smallest pallas tile."""
    monkeypatch.setenv("BP_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("BP_EC_KERNEL", "pallas")
    from bulletproofs_tpu.ops import msm as msm_mod

    rng = random.Random(77)
    n = 48
    with using_curve(BLS381):
        pts = [G1.from_msg_hash(b"t%d" % i) for i in range(n)]
        scs = [Scalar.random(rng) for _ in range(n)]
        expected = msm_host(pts, scs)
        P, affine = ej.to_device_points_affine(pts, ctx)
        assert affine
        s = ej.to_device_scalars(scs, ctx)
        (got,) = msm_mod.msm_hybrid(P, s[None], ctx, c=4, affine=True)
    assert got == expected


def test_to_device_points_affine_normalizes(ctx):
    """Projective host points are normalized to Z == 1; identity points
    disqualify the table (affine == False, plain conversion)."""
    rng = random.Random(7)
    with using_curve(BLS381):
        a = G1.from_msg_hash(b"a")
        b = G1.from_msg_hash(b"b")
        proj = a + b                      # host add -> projective (Z != 1)
        assert proj.Z != 1
        arr, affine = ej.to_device_points_affine([a, proj], ctx)
        assert affine
        back = ej.from_device_points(arr, ctx)
        assert back[0] == a and back[1] == proj
        assert back[1].Z == 1             # normalized in the table

        ident = G1.identity(BLS381)
        arr2, affine2 = ej.to_device_points_affine([a, ident], ctx)
        assert not affine2
        back2 = ej.from_device_points(arr2, ctx)
        assert back2[1].is_identity()
