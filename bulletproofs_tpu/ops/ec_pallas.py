"""Pallas (Mosaic) fused kernel for the EC hot op: complete G1 addition.

The XLA path (ops/ec_jax.py) reaches ~20% of VPU integer peak: every scan
stage materializes its operands in HBM. This kernel runs the COMPLETE EC
addition as one Mosaic kernel with all intermediates resident in VMEM,
tiled over the batch axis.

Mosaic constraints shaped this variant:
- no lax.scan with extensive args and no scatter: the field layer's fully
  unrolled, concat-based paths are used (BP_CIOS_UNROLL >= n_limbs);
- every tensor is strictly 2-D (limbs x lanes): coordinates are separate
  refs and the 12 field multiplies are issued unstacked (the 6-wide stacked
  form creates 3-D intermediates that ICE Mosaic's layout inference);
- array constants can't be captured: the modulus limbs arrive as an input.

STATUS (round 3): raced against the XLA pipeline at the MSM bucket-loop
shape (scripts/bench_ec_add_variants.py); see NOTES.md for the verdict.
"""

from contextlib import contextmanager
from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field_jax as fj
from .field_jax import add_mod, mont_mul, mul_small, sub_mod

# batch tile (lanes); multiple of 128
TILE = 512


@contextmanager
def _full_unroll():
    """Force the scan-free fully-unrolled field paths during kernel TRACE:
    Mosaic can't lower lax.scan with xs/ys, and the env-based unroll knobs
    (tests run BP_CIOS_UNROLL=1) must not leak into kernel bodies."""
    old = (fj._UNROLL, fj._CIOS_UNROLL)
    fj._UNROLL, fj._CIOS_UNROLL = 1 << 30, 1 << 30
    try:
        yield
    finally:
        fj._UNROLL, fj._CIOS_UNROLL = old


def _shim(ctx, mod):
    """FieldCtx stand-in whose modulus is a traced kernel input."""
    return SimpleNamespace(L=ctx.fp.L, mod=mod, fp=ctx.fp.fp,
                           mod_int=ctx.fp.mod_int)


def _ec_add_2d(f, b3, X1, Y1, Z1, X2, Y2, Z2, mul=mont_mul):
    """RCB16 complete add (a=0) on separate 2-D (L, T) coordinates —
    identical math to ec_jax.ec_add, unstacked for Mosaic.  `mul` selects
    the in-kernel Montgomery multiply (CIOS default, MXU-REDC variant)."""
    t0 = mul(X1, X2, f)
    t1 = mul(Y1, Y2, f)
    t2 = mul(Z1, Z2, f)
    xy = sub_mod(sub_mod(mul(add_mod(X1, Y1, f), add_mod(X2, Y2, f), f),
                         t0, f), t1, f)
    yz = sub_mod(sub_mod(mul(add_mod(Y1, Z1, f), add_mod(Y2, Z2, f), f),
                         t1, f), t2, f)
    xz = sub_mod(sub_mod(mul(add_mod(X1, Z1, f), add_mod(X2, Z2, f), f),
                         t0, f), t2, f)
    b3_t2 = mul_small(t2, b3, f)
    m = sub_mod(t1, b3_t2, f)
    n = add_mod(t1, b3_t2, f)
    X3 = sub_mod(mul(xy, m, f),
                 mul_small(mul(yz, xz, f), b3, f), f)
    Y3 = add_mod(mul(n, m, f),
                 mul_small(mul(t0, xz, f), 3 * b3, f), f)
    Z3 = add_mod(mul(yz, n, f),
                 mul_small(mul(t0, xy, f), 3, f), f)
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# In-kernel MXU-REDC Montgomery multiply
#
# Separated REDC with the fixed-operand halves as int8 Toeplitz matmuls
# (field_jax.mont_mul_mxu), adapted for Mosaic: the a*b schoolbook half is
# a fully UNROLLED concat-shift accumulation (no lax.scan), and the
# Toeplitz tables/consts arrive as kernel refs (Mosaic can't capture
# array constants).  Bit-exact with CIOS; raced by BP_EC_KERNEL=pallas_mxu
# (scripts/bench_ec_add_variants.py round 3).
# ---------------------------------------------------------------------------

def _mul_columns_unrolled(a, b):
    """(L, T) x (L, T) -> relaxed product columns (2L+1, T), scan-free."""
    import numpy as _np
    La, Lb = a.shape[0], b.shape[0]
    T = a.shape[1]
    ncols = La + Lb + 1
    U32 = a.dtype
    MASK = _np.uint32((1 << 16) - 1)
    def shifted(x, k):
        """x placed at row offset k within ncols rows (no 0-size blocks:
        Mosaic rejects empty vector operands)."""
        parts = []
        if k:
            parts.append(jnp.zeros((k, T), U32))
        parts.append(x)
        tail = ncols - k - x.shape[0]
        if tail:
            parts.append(jnp.zeros((tail, T), U32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=0)

    cols = jnp.zeros((ncols, T), U32)
    for i in range(La):
        p = a[i] * b                                 # (Lb, T) exact
        cols = cols + shifted(p & MASK, i) + shifted(p >> 16, i + 1)
    return cols


def _mxu_mont_mul_factory(fctx, tm, tn):
    """Build the in-kernel mul(a, b, f) closure over traced Toeplitz refs
    (tm = (Ts_m, const_m) for (T_lo * N') mod R, tn = (Ts_n, const_n) for
    m * N)."""
    from .field_jax import (MASK, _carry_norm, _carry_sub_norm,
                            _u8cols_to_u16cols, _u16_to_u8)

    def _apply(Ts, const, x8):
        xi = x8.astype(jnp.int32)
        xs = (xi - 128).astype(jnp.int8)
        y = jax.lax.dot_general(
            Ts, xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y + const + 128 * jnp.sum(xi - 128, axis=0, keepdims=True)
        return y.astype(jnp.uint32)

    def mul(a, b, f):
        L = f.L
        t = _mul_columns_unrolled(a, b)
        t_norm = _carry_norm(t, 2 * L)
        x8 = _u16_to_u8(t_norm[:L])
        m_cols = _apply(*tm, x8)                     # byte-base relaxed
        # canonical 16-bit m, then back to bytes for the second matmul
        m16 = _carry_norm(_u8cols_to_u16cols(m_cols), L + 1)[:L]
        m8 = _u16_to_u8(m16)
        mn_cols = _apply(*tn, m8)
        mn16 = _u8cols_to_u16cols(mn_cols)
        total = mn16 + t_norm
        summed = _carry_norm(total, 2 * L + 1)
        return _carry_sub_norm(summed[L:], f.mod, L + 1)[:L]

    return mul


def _add_kernel(ctx):
    def kernel(x1, y1, z1, x2, y2, z2, mod_ref, ox, oy, oz):
        with _full_unroll():
            f = _shim(ctx, mod_ref[:])
            X3, Y3, Z3 = _ec_add_2d(f, ctx.b3, x1[:], y1[:], z1[:],
                                    x2[:], y2[:], z2[:])
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
    return kernel


def _ec_madd_2d(f, b3, X1, Y1, Z1, X2, Y2, mul=mont_mul):
    """RCB16 complete MIXED add (a=0, Z2 == 1 implicit — algorithm 8):
    11 multiplies instead of the general form's 12 and four fewer add/sub
    chains.  Complete for any projective P1 (including the identity and
    P1 == P2) and any AFFINE on-curve P2; callers guarantee the table is
    affine (ops/ec_jax.to_device_points_affine)."""
    t0 = mul(X1, X2, f)
    t1 = mul(Y1, Y2, f)
    xy = sub_mod(sub_mod(mul(add_mod(X1, Y1, f), add_mod(X2, Y2, f), f),
                         t0, f), t1, f)
    yz = add_mod(mul(Y2, Z1, f), Y1, f)
    xz = add_mod(mul(X2, Z1, f), X1, f)
    b3_t2 = mul_small(Z1, b3, f)
    m = sub_mod(t1, b3_t2, f)
    n = add_mod(t1, b3_t2, f)
    X3 = sub_mod(mul(xy, m, f),
                 mul_small(mul(yz, xz, f), b3, f), f)
    Y3 = add_mod(mul(n, m, f),
                 mul_small(mul(t0, xz, f), 3 * b3, f), f)
    Z3 = add_mod(mul(yz, n, f),
                 mul_small(mul(t0, xy, f), 3, f), f)
    return X3, Y3, Z3


def _round_kernel_mxu(ctx, L):
    """MXU-REDC variant of the fused bucket-round kernel: same structure,
    Montgomery multiplies route their fixed-operand REDC halves through
    int8 Toeplitz matmuls on the MXU."""
    def kernel(xb, yb, zb, rows, found, mod_ref, one_ref,
               tsm, cm, tsn, cn, ox, oy, oz):
        with _full_unroll():
            f = _shim(ctx, mod_ref[:])
            mul = _mxu_mont_mul_factory(f, (tsm[:], cm[:]),
                                        (tsn[:], cn[:]))
            r = rows[:]
            dx = r[:, 0:L].T
            dy = r[:, L:2 * L].T
            dz = r[:, 2 * L:3 * L].T
            ok = found[:]
            one = one_ref[:]
            dx = jnp.where(ok != 0, dx, 0)
            dy = jnp.where(ok != 0, dy, one)
            dz = jnp.where(ok != 0, dz, 0)
            X3, Y3, Z3 = _ec_add_2d(f, ctx.b3, xb[:], yb[:], zb[:],
                                    dx, dy, dz, mul=mul)
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
    return kernel


@partial(jax.jit, static_argnums=(3,))
def bucket_round_add_pallas_mxu(buckets, rows, found, ctx):
    """MXU-REDC fused round (see bucket_round_add_pallas)."""
    from .field_jax import _mxu_tables
    L = buckets.shape[1]
    S = buckets.shape[2]
    tile = _pick_tile(S)
    assert tile is not None
    grid = (S // tile,)
    cspec = pl.BlockSpec((L, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tile, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    (tsm, cm), (tsn, cn) = _mxu_tables(ctx.fp)
    t_specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
               for t in (tsm, cm, tsn, cn)]
    mod = jnp.asarray(ctx.fp.mod)
    one_m = jnp.asarray(ctx.fp.one_m).reshape(L, 1)
    shape = jax.ShapeDtypeStruct((L, S), buckets.dtype)
    X3, Y3, Z3 = pl.pallas_call(
        _round_kernel_mxu(ctx, L),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[cspec, cspec, cspec, rspec, fspec, mspec, mspec]
        + t_specs,
        out_specs=(cspec, cspec, cspec),
    )(buckets[0], buckets[1], buckets[2], rows,
      found.astype(jnp.int32).reshape(1, S), mod, one_m,
      jnp.asarray(tsm), jnp.asarray(cm), jnp.asarray(tsn),
      jnp.asarray(cn))
    return jnp.stack([X3, Y3, Z3], axis=0)


def _round_kernel(ctx, L):
    """Fused bucket-round body: (slots, 3L) gathered rows -> in-kernel
    transpose to limbs-first, identity masking for empty slots, complete
    RCB16 add into the bucket accumulators — one Mosaic kernel, VMEM
    resident.  Replaces the XLA chain gather->transpose->where->ec_add
    whose transpose/where stages alone cost ~25% of the bucket loop."""
    def kernel(xb, yb, zb, rows, found, mod_ref, one_ref,
               ox, oy, oz):
        with _full_unroll():
            f = _shim(ctx, mod_ref[:])
            r = rows[:]                       # (T, 3L)
            dx = r[:, 0:L].T                  # (L, T) delta coords
            dy = r[:, L:2 * L].T
            dz = r[:, 2 * L:3 * L].T
            ok = found[:]                     # (1, T) int32 mask
            # empty slots add the identity (0 : 1 : 0)
            one = one_ref[:]                  # (L, 1) Montgomery 1
            dx = jnp.where(ok != 0, dx, 0)
            dy = jnp.where(ok != 0, dy, one)
            dz = jnp.where(ok != 0, dz, 0)
            X3, Y3, Z3 = _ec_add_2d(f, ctx.b3, xb[:], yb[:], zb[:],
                                    dx, dy, dz)
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
    return kernel


def _pick_tile(S):
    """Lane tile for the bucket kernels; BP_PALLAS_TILE overrides for
    hardware sweeps (must divide the slot count)."""
    import os
    env = os.environ.get("BP_PALLAS_TILE")
    if env:
        t = int(env)
        return t if S % t == 0 else None
    for t in (512, 256, 128):
        if S % t == 0:
            return t
    return None


def _interpret():
    """Interpret-mode escape hatch so CPU tests can exercise the kernels
    (Mosaic only lowers on real TPU targets)."""
    import os
    return os.environ.get("BP_PALLAS_INTERPRET") == "1"


def _kernel_unroll():
    """Full unroll is a MOSAIC requirement (no lax.scan with xs/ys); the
    interpret-mode CI path keeps the test-friendly scan forms — identical
    math, ~10x faster XLA-CPU compile."""
    from contextlib import nullcontext
    return nullcontext() if _interpret() else _full_unroll()


# ---------------------------------------------------------------------------
# Round-CHUNKED fused kernel: R_c rounds per pallas_call
#
# The per-round kernel above pays, per round, one pallas launch plus a full
# bucket-array HBM round trip (~4.8 MB at the n=2^16 shape).  Here the grid
# is (tiles, R_c) with ROUNDS INNERMOST: for a fixed bucket tile the output
# block index is constant across the inner rounds axis, so Mosaic keeps the
# accumulators VMEM-RESIDENT for all R_c rounds (the standard revisited-
# output reduction pattern) while the gathered row blocks stream in a
# pipelined fashion.  Per chunk the buckets cross HBM once instead of R_c
# times and the launch overhead is paid once.
# ---------------------------------------------------------------------------

def _rounds_chunk_kernel(ctx, L):
    def kernel(xb, yb, zb, rows, found, mod_ref, one_ref, ox, oy, oz):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            # first round of this tile: seed the VMEM accumulators from the
            # incoming bucket state (out blocks are revisited, not reloaded)
            ox[:] = xb[:]
            oy[:] = yb[:]
            oz[:] = zb[:]

        with _kernel_unroll():
            f = _shim(ctx, mod_ref[:])
            rr = rows[:]                      # (T, 3L) this round's rows
            dx = rr[:, 0:L].T
            dy = rr[:, L:2 * L].T
            dz = rr[:, 2 * L:3 * L].T
            ok = found[:]                     # (1, T)
            one = one_ref[:]
            dx = jnp.where(ok != 0, dx, 0)
            dy = jnp.where(ok != 0, dy, one)
            dz = jnp.where(ok != 0, dz, 0)
            X3, Y3, Z3 = _ec_add_2d(f, ctx.b3, ox[:], oy[:], oz[:],
                                    dx, dy, dz)
        ox[:] = X3
        oy[:] = Y3
        oz[:] = Z3
    return kernel


@partial(jax.jit, static_argnums=(3,))
def bucket_rounds_chunk_pallas(buckets, rows, found, ctx):
    """R_c bucket rounds in ONE pallas_call.

    buckets (3, L, S) Montgomery accumulators; rows (R_c*S, 3L) gathered
    delta rows, round-major; found (R_c, S) int32 occupancy mask ->
    updated buckets after all R_c rounds.
    """
    L = buckets.shape[1]
    S = buckets.shape[2]
    R_c = found.shape[0]
    tile = _pick_tile(S)
    assert tile is not None, "slot count must divide by a pallas tile"
    n_tiles = S // tile
    grid = (n_tiles, R_c)                     # rounds INNERMOST
    cspec = pl.BlockSpec((L, tile), lambda i, r: (0, i),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tile, 3 * L), lambda i, r: (r * n_tiles + i, 0),
                         memory_space=pltpu.VMEM)
    # found rides as (1, R_c*S) round-major: a (1, tile) block over a
    # 1-row array satisfies Mosaic's sublane rule (block dim == array dim);
    # the natural (R_c, S) layout with 1-row blocks does not.
    fspec = pl.BlockSpec((1, tile), lambda i, r: (0, r * n_tiles + i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((L, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM)
    mod = jnp.asarray(ctx.fp.mod)
    one_m = jnp.asarray(ctx.fp.one_m).reshape(L, 1)
    shape = jax.ShapeDtypeStruct((L, S), buckets.dtype)
    X3, Y3, Z3 = pl.pallas_call(
        _rounds_chunk_kernel(ctx, L),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[cspec, cspec, cspec, rspec, fspec, mspec, mspec],
        out_specs=(cspec, cspec, cspec),
        interpret=_interpret(),
    )(buckets[0], buckets[1], buckets[2], rows,
      found.astype(jnp.int32).reshape(1, R_c * S), mod, one_m)
    return jnp.stack([X3, Y3, Z3], axis=0)


def _rounds_chunk_kernel_mixed(ctx, L):
    """Mixed-add variant of the chunked round body: rows carry only the
    affine (X, Y) delta coordinates — (T, 2L) instead of (T, 3L), 33% less
    gather/HBM traffic — and the add is the 11-mul complete mixed form.
    Empty slots POST-select the old accumulator instead of adding the
    identity (the mixed form has no projective identity encoding)."""
    def kernel(xb, yb, zb, rows, found, mod_ref, ox, oy, oz):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            ox[:] = xb[:]
            oy[:] = yb[:]
            oz[:] = zb[:]

        with _kernel_unroll():
            f = _shim(ctx, mod_ref[:])
            rr = rows[:]                      # (T, 2L) affine delta coords
            dx = rr[:, 0:L].T
            dy = rr[:, L:2 * L].T
            ok = found[:]                     # (1, T)
            X1, Y1, Z1 = ox[:], oy[:], oz[:]
            X3, Y3, Z3 = _ec_madd_2d(f, ctx.b3, X1, Y1, Z1, dx, dy)
        ox[:] = jnp.where(ok != 0, X3, X1)
        oy[:] = jnp.where(ok != 0, Y3, Y1)
        oz[:] = jnp.where(ok != 0, Z3, Z1)
    return kernel


@partial(jax.jit, static_argnums=(3,))
def bucket_rounds_chunk_pallas_mixed(buckets, rows, found, ctx):
    """R_c bucket rounds in ONE pallas_call, mixed-add form.

    buckets (3, L, S) Montgomery accumulators; rows (R_c*S, 2L) gathered
    AFFINE delta rows (X, Y Montgomery), round-major; found (R_c, S) int32
    occupancy mask -> updated buckets after all R_c rounds.
    """
    L = buckets.shape[1]
    S = buckets.shape[2]
    R_c = found.shape[0]
    tile = _pick_tile(S)
    assert tile is not None, "slot count must divide by a pallas tile"
    n_tiles = S // tile
    grid = (n_tiles, R_c)                     # rounds INNERMOST
    cspec = pl.BlockSpec((L, tile), lambda i, r: (0, i),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tile, 2 * L), lambda i, r: (r * n_tiles + i, 0),
                         memory_space=pltpu.VMEM)
    # (1, R_c*S) round-major occupancy — see bucket_rounds_chunk_pallas.
    fspec = pl.BlockSpec((1, tile), lambda i, r: (0, r * n_tiles + i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((L, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM)
    mod = jnp.asarray(ctx.fp.mod)
    shape = jax.ShapeDtypeStruct((L, S), buckets.dtype)
    X3, Y3, Z3 = pl.pallas_call(
        _rounds_chunk_kernel_mixed(ctx, L),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[cspec, cspec, cspec, rspec, fspec, mspec],
        out_specs=(cspec, cspec, cspec),
        interpret=_interpret(),
    )(buckets[0], buckets[1], buckets[2], rows,
      found.astype(jnp.int32).reshape(1, R_c * S), mod)
    return jnp.stack([X3, Y3, Z3], axis=0)


def bucket_round_supported(ctx, S):
    """The fused round kernel covers a = 0 curves (every curve but
    ed25519) at slot counts divisible by a lane tile."""
    return ctx.a_is_zero and _pick_tile(S) is not None


@partial(jax.jit, static_argnums=(3,))
def bucket_round_add_pallas(buckets, rows, found, ctx):
    """buckets (3, L, S) Montgomery + gathered rows (S, 3L) + found (S,)
    -> updated buckets."""
    L = buckets.shape[1]
    S = buckets.shape[2]
    tile = _pick_tile(S)
    assert tile is not None, "slot count must divide by a pallas tile"
    grid = (S // tile,)
    cspec = pl.BlockSpec((L, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tile, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mod = jnp.asarray(ctx.fp.mod)
    one_m = jnp.asarray(ctx.fp.one_m).reshape(L, 1)
    shape = jax.ShapeDtypeStruct((L, S), buckets.dtype)
    X3, Y3, Z3 = pl.pallas_call(
        _round_kernel(ctx, L),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[cspec, cspec, cspec, rspec, fspec, mspec, mspec],
        out_specs=(cspec, cspec, cspec),
    )(buckets[0], buckets[1], buckets[2], rows,
      found.astype(jnp.int32).reshape(1, S), mod, one_m)
    return jnp.stack([X3, Y3, Z3], axis=0)


@partial(jax.jit, static_argnums=(2,))
def ec_add_pallas(P, Q, ctx):
    """Batched complete EC add via one fused Mosaic kernel.
    P, Q: (3, L, n) with n a multiple of TILE (caller pads)."""
    n = P.shape[2]
    L = P.shape[1]
    assert n % TILE == 0, "batch must be padded to the pallas tile"
    grid = (n // TILE,)
    spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    mod_spec = pl.BlockSpec((L, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mod = jnp.asarray(ctx.fp.mod)
    shape = jax.ShapeDtypeStruct((L, n), P.dtype)
    X3, Y3, Z3 = pl.pallas_call(
        _add_kernel(ctx),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec] * 6 + [mod_spec],
        out_specs=(spec, spec, spec),
    )(P[0], P[1], P[2], Q[0], Q[1], Q[2], mod)
    return jnp.stack([X3, Y3, Z3], axis=0)
