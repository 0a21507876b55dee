"""PARKED EXPERIMENT: 8-bit-limb f32 Montgomery field kernels.

VERDICT (round 2, scripts/probe_vpu.py on v5e): the premise is FALSE —
u32 multiply issues at 4.9-12 T ops/s, f32 FMA at 8.5 T ops/s, so the 4x
partial-product overhead of 8-bit limbs cannot be bought back.  Kept as
the documented negative result; not wired into any production path.

Original motivation: if the TPU VPU emulated 32-bit integer multiplies as
multi-op sequences, an 8-bit-limb formulation in f32 (4x the partial
products, each at full FMA rate) would win.

Representation: L8 = 2 * n_limbs little-endian 8-bit limbs stored as f32
(values 0..255), limbs on axis 0, batch trailing — same layout discipline
as ops/field_jax.py.  The Montgomery radix R = 2^(8*L8) equals the 16-bit
backend's R, so Montgomery-domain values are bit-identical integers and
converting between representations is pure byte repacking.

Exactness argument: f32 holds integers < 2^24 exactly.  Schoolbook/CIOS
column accumulators stay < L8 * 2 * 255^2 ~= 6.3e6 < 2^24 for L8 = 48;
carries are floor(x * 2^-8) (multiplication by a power of two and floor are
exact); byte extraction is x - 256*floor(x * 2^-8).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

F32 = jnp.float32
INV256 = np.float32(1.0 / 256.0)
C256 = np.float32(256.0)


def ints_to_limbs8(values, n_limbs8):
    """Python ints -> (L8, n) f32 8-bit limbs."""
    buf = b"".join(int(v).to_bytes(n_limbs8, "little") for v in values)
    if not values:
        return np.zeros((n_limbs8, 0), np.float32)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(values), n_limbs8)
    return np.ascontiguousarray(arr.T).astype(np.float32)


def limbs8_to_ints(arr):
    arr = np.asarray(arr)
    L8 = arr.shape[0]
    flat = arr.reshape(L8, -1).T.astype(np.uint8)
    buf = flat.tobytes()
    return [int.from_bytes(buf[j * L8:(j + 1) * L8], "little")
            for j in range(flat.shape[0])]


def u16_to_f8(a):
    """(L, *batch) uint32 16-bit limbs -> (2L, *batch) f32 8-bit limbs."""
    lo = (a & 0xFF).astype(F32)
    hi = ((a >> 8) & 0xFF).astype(F32)
    L = a.shape[0]
    out = jnp.stack([lo, hi], axis=1)            # (L, 2, *batch)
    return out.reshape((2 * L,) + a.shape[1:])


def f8_to_u16(a):
    """(2L, *batch) f32 8-bit limbs -> (L, *batch) uint32 16-bit limbs."""
    L8 = a.shape[0]
    ai = a.astype(jnp.uint32)
    pairs = ai.reshape((L8 // 2, 2) + a.shape[1:])
    return pairs[:, 0] + (pairs[:, 1] << 8)


class F32FieldCtx:
    """f32 twin of field_jax.FieldCtx (same Montgomery domain)."""

    _cache = {}

    def __new__(cls, fp):
        if fp.modulus in cls._cache:
            return cls._cache[fp.modulus]
        self = super().__new__(cls)
        cls._cache[fp.modulus] = self
        self.fp = fp
        self.L8 = fp.n_limbs * 2
        self.mod_int = fp.modulus
        self.mod = ints_to_limbs8([fp.modulus], self.L8)
        self.n0inv8 = np.float32((-pow(fp.modulus, -1, 256)) % 256)
        self.one_m = ints_to_limbs8([fp.mont_r % fp.modulus], self.L8)
        self.zero = ints_to_limbs8([0], self.L8)
        return self


def _floor_div256(x):
    return jnp.floor(x * INV256)


def _carry_norm8(cols, out_len):
    """Relaxed f32 columns (< 2^24) -> canonical 8-bit limbs (unrolled)."""
    K = cols.shape[0]
    if K < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - K,) + cols.shape[1:], F32)], axis=0)
    elif K > out_len:
        cols = cols[:out_len]
    outs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_len):
        s = cols[k] + carry
        carry = _floor_div256(s)
        outs.append(s - C256 * carry)
    return jnp.stack(outs, axis=0)


def _sub_if_ge8(x, m):
    """x - m if x >= m else x; canonical 8-bit limb borrow chain."""
    L8 = x.shape[0]
    mb = jnp.broadcast_to(m.reshape((L8,) + (1,) * (x.ndim - 1)), x.shape)
    outs = []
    borrow = jnp.zeros_like(x[0])
    for k in range(L8):
        t = x[k] + C256 - mb[k] - borrow
        q = _floor_div256(t)                      # 1 if no borrow else 0
        outs.append(t - C256 * q)
        borrow = 1.0 - q
    diff = jnp.stack(outs, axis=0)
    return jnp.where((borrow == 0)[None], diff, x)


def add_mod8(a, b, ctx: F32FieldCtx):
    cols = a + b
    return _sub_if_ge8(_carry_norm8(cols, ctx.L8 + 1)[:ctx.L8],
                       jnp.asarray(ctx.mod[:, 0]))


def sub_mod8(a, b, ctx: F32FieldCtx):
    L8 = ctx.L8
    mb = jnp.asarray(ctx.mod[:, 0])
    outs = []
    borrow = jnp.zeros_like(a[0])
    for k in range(L8):
        t = a[k] + C256 - b[k] - borrow
        q = _floor_div256(t)
        outs.append(t - C256 * q)
        borrow = 1.0 - q
    diff = jnp.stack(outs, axis=0)
    # if borrowed, add the modulus back
    fixed = _carry_norm8(
        diff + jnp.broadcast_to(mb.reshape((L8,) + (1,) * (a.ndim - 1)),
                                a.shape), L8)
    return jnp.where((borrow == 1.0)[None], fixed, diff)


def neg_mod8(a, ctx: F32FieldCtx):
    zero = jnp.zeros_like(a)
    return sub_mod8(zero, a, ctx)


_CIOS8_UNROLL = 48      # fully unrolled: loop overhead dwarfs the step


def mont_mul8(a, b, ctx: F32FieldCtx):
    """Fused CIOS over 8-bit f32 limbs, canonical in/out.

    Column accumulators stay < L8 * 2 * 255^2 < 2^24 (exact); the running
    value shifts one limb per iteration; t[0]'s low byte is exact at every
    step (carries only flow upward)."""
    L8 = ctx.L8
    a, b = jnp.broadcast_arrays(a, b) if a.shape != b.shape else (a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    bb = jnp.broadcast_to(b, (L8,) + batch)
    modb = jnp.broadcast_to(
        jnp.asarray(ctx.mod[:, 0]).reshape((L8,) + (1,) * len(batch)),
        (L8,) + batch)
    t = jnp.zeros((L8 + 1,) + batch, F32)
    zero_row = jnp.zeros((1,) + batch, F32)

    def step(t, a_i):
        t = t + jnp.concatenate([a_i * bb, zero_row], axis=0)
        t0 = t[0]
        low = t0 - C256 * _floor_div256(t0)
        m = low * ctx.n0inv8
        m = m - C256 * _floor_div256(m)           # m mod 256
        t = t + jnp.concatenate([m * modb, zero_row], axis=0)
        carry0 = _floor_div256(t[0])
        return jnp.concatenate([(t[1] + carry0)[None], t[2:], zero_row],
                               axis=0)

    if _CIOS8_UNROLL >= L8:
        for i in range(L8):
            t = step(t, a[i])
    else:
        t, _ = jax.lax.scan(lambda c, x: (step(c, x), None), t, a,
                            unroll=_CIOS8_UNROLL)
    norm = _carry_norm8(t, L8 + 1)[:L8]
    return _sub_if_ge8(norm, jnp.asarray(ctx.mod[:, 0]))
