"""Sharded-path hardening at real sizes (VERDICT r2 weak #6 / tasks 6+8):

- sharded MSM vs host at n=4096 with skewed + degenerate scalars
- imbalanced shard occupancy (all the heavy scalars in one shard)
- non-divisible n (pad path)
- 2-D (host x chip) mesh with hierarchical ICI-then-DCN bucket reduction

All on the 8-device virtual CPU mesh (tests/conftest.py); shardings and
collectives compile identically on real hardware.
"""

import random

import jax
import pytest

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops.ec_host import G1, msm_host
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.parallel import make_mesh, msm_sharded_jit
from bulletproofs_tpu.parallel.sharded_msm import (
    make_mesh_2d, msm_sharded_2d_jit)


def _points(rng, n, distinct=256):
    base = [G1.random(rng) for _ in range(min(n, distinct))]
    return (base * (n // len(base) + 1))[:n]


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8])


def _check(pts, ks, mesh, c=8, two_d=False):
    ctx = ej.CurveCtx(BLS381)
    P = ej.to_device_points(pts, ctx)
    s = ej.to_device_scalars(ks, ctx)
    fn = msm_sharded_2d_jit if two_d else msm_sharded_jit
    out = fn(P, s, ctx, c, mesh)
    assert ej.from_device_points(out, ctx)[0] == msm_host(pts, ks)


def test_sharded_msm_n4096_uniform(mesh8):
    with using_curve(BLS381):
        rng = random.Random(41)
        pts = _points(rng, 4096)
        ks = [Scalar(rng.randrange(BLS381.r)) for _ in range(4096)]
        _check(pts, ks, mesh8)


def test_sharded_msm_skewed_and_degenerate(mesh8):
    """Bit-vector-style scalars (0/1) plus repeated constants: occupancy
    concentrates in single buckets; the global static round count must
    escalate, not drop points."""
    with using_curve(BLS381):
        rng = random.Random(42)
        n = 2048
        pts = _points(rng, n)
        ks = [Scalar(rng.randrange(2)) for _ in range(n)]      # 0/1 bits
        ks[17] = Scalar(BLS381.r - 1)
        ks[1000] = Scalar(1 << 200)
        _check(pts, ks, mesh8, c=6)


def test_sharded_msm_imbalanced_shards(mesh8):
    """All heavy scalars land in shard 0 (first n/8 entries); other shards
    are nearly empty.  Result must still be exact (round count follows the
    worst shard)."""
    with using_curve(BLS381):
        rng = random.Random(43)
        n = 2048
        pts = _points(rng, n)
        ks = [Scalar.zero()] * n
        for i in range(n // 8):                        # shard 0 only
            ks[i] = Scalar(rng.randrange(BLS381.r))
        for i in range(n // 8, n, 97):                 # sparse elsewhere
            ks[i] = Scalar(3)
        _check(pts, ks, mesh8, c=6)


def test_sharded_msm_non_divisible(mesh8):
    """n not divisible by the mesh size: the pad path (identity points,
    zero scalars) must keep the result exact."""
    with using_curve(BLS381):
        rng = random.Random(44)
        for n in (61, 333, 1001):
            pts = _points(rng, n, distinct=64)
            ks = [Scalar(rng.randrange(BLS381.r)) for _ in range(n)]
            _check(pts, ks, mesh8, c=6)


def test_sharded_msm_2d_mesh():
    """2x4 (host x chip) mesh with hierarchical bucket reduction: ICI
    butterfly within hosts, then DCN butterfly across hosts."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh_2d(2, 4)
    with using_curve(BLS381):
        rng = random.Random(45)
        n = 1024
        pts = _points(rng, n, distinct=128)
        ks = [Scalar(rng.randrange(BLS381.r)) for _ in range(n)]
        _check(pts, ks, mesh, c=6, two_d=True)


def test_sharded_msm_2d_mesh_4x2_nondivisible():
    assert len(jax.devices()) >= 8
    mesh = make_mesh_2d(4, 2)
    with using_curve(BLS381):
        rng = random.Random(46)
        n = 515                                        # not divisible by 8
        pts = _points(rng, n, distinct=64)
        ks = [Scalar(rng.randrange(BLS381.r)) for _ in range(n)]
        ks[0] = Scalar.zero()
        _check(pts, ks, mesh, c=6, two_d=True)
