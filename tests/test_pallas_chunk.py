"""Round-chunked fused bucket kernel (ops/ec_pallas.py
bucket_rounds_chunk_pallas) vs the plain XLA masked-add math, via pallas
interpret mode (Mosaic doesn't lower on the CPU test mesh; interpret mode
exercises the same grid/index-map/revisited-output semantics).

The kernel must be BIT-identical to the XLA body: both run the same RCB16
complete add with identity-masked deltas, so every limb matches exactly.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops import ec_jax as ej


@pytest.fixture
def ctx():
    with using_curve(BLS381):
        yield ej.CurveCtx(BLS381)


def test_chunked_kernel_matches_xla_body(ctx, monkeypatch):
    monkeypatch.setenv("BP_PALLAS_INTERPRET", "1")
    from bulletproofs_tpu.ops.ec_pallas import bucket_rounds_chunk_pallas

    rng = random.Random(1234)
    n, S, R_c = 32, 128, 4
    L = ctx.fp.L

    with using_curve(BLS381):
        pts = [G1.from_msg_hash(bytes([i])) for i in range(n)]
        P = ej.to_device_points(pts, ctx)              # (3, L, n) Montgomery
        binit = [G1.from_msg_hash(b"b%d" % i) for i in range(S)]
        buckets = ej.to_device_points(binit, ctx)      # (3, L, S)

    rows_all = jnp.transpose(P, (2, 0, 1)).reshape(n, 3 * L)
    pid = np.array([[rng.randrange(n) for _ in range(S)]
                    for _ in range(R_c)], np.int32)
    found = np.array([[rng.random() < 0.7 for _ in range(S)]
                      for _ in range(R_c)], np.int32)

    rows = rows_all[pid.reshape(-1)]                   # (R_c*S, 3L)
    out = bucket_rounds_chunk_pallas(buckets, rows, jnp.asarray(found), ctx)

    # reference: same masked complete add, plain XLA, one round at a time
    exp = buckets
    identity = ctx.identity
    for r in range(R_c):
        pts_r = rows_all[pid[r]].reshape(S, 3, L).transpose(1, 2, 0)
        ok = jnp.asarray(found[r])[None, None, :]
        delta = jnp.where(ok != 0, pts_r, identity.reshape(3, L, 1))
        exp = ej.ec_add(exp, delta, ctx)

    assert jnp.array_equal(out, exp), "chunked kernel diverged from XLA body"


def test_chunked_kernel_empty_rounds(ctx, monkeypatch):
    """All-empty rounds must leave the buckets exactly unchanged except for
    the identity-add normalization (identical to the XLA body's)."""
    monkeypatch.setenv("BP_PALLAS_INTERPRET", "1")
    from bulletproofs_tpu.ops.ec_pallas import bucket_rounds_chunk_pallas

    S, R_c = 128, 2
    L = ctx.fp.L
    with using_curve(BLS381):
        binit = [G1.from_msg_hash(b"c%d" % i) for i in range(S)]
        buckets = ej.to_device_points(binit, ctx)

    rows = jnp.zeros((R_c * S, 3 * L), jnp.uint32)
    found = jnp.zeros((R_c, S), jnp.int32)
    out = bucket_rounds_chunk_pallas(buckets, rows, found, ctx)

    exp = buckets
    identity = ctx.identity
    for _ in range(R_c):
        exp = ej.ec_add(exp, jnp.broadcast_to(
            identity.reshape(3, L, 1), (3, L, S)), ctx)
    assert jnp.array_equal(out, exp)
