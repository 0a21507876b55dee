"""Device (JAX/TPU) prime-field arithmetic: batched 16-bit-limb Montgomery
kernels.

This is the TPU-native replacement for the serial bignum layer the reference
consumes through `amcl_wrapper::FieldElement` / `BigNum` (reference usage
inventory in SURVEY.md section 2.1; serial loops e.g. the IPA fold
`/root/reference/src/ipp.rs:115-130` all bottom out here).

Representation
--------------
A field element is `n_limbs` little-endian 16-bit limbs stored in uint32
lanes, limbs on AXIS 0, arbitrary batch dims trailing: shape (L, *batch).
Batch-last keeps the vector axis on TPU lanes (128-wide) and the limb axis on
sublanes, so every limb op is a full-width VPU op over the batch.

Why 16-bit limbs in uint32: the widest exact integer multiply on the TPU VPU
is 32-bit, and (2^16-1)^2 + 2*(2^16-1) < 2^32, so schoolbook partial products
plus carry/addend never overflow a lane.

All mul-heavy code works in Montgomery form with R = 2^(16*L).  The REDC here
is the "separated" form (full product -> m = T*N' mod R -> (T + m*N)/R) rather
than word-serial CIOS: it has fewer sequential dependencies and a much smaller
XLA graph, which matters because these functions are inlined into EC formulas
inside scan/loop bodies.

Values are kept CANONICAL (< modulus) at function boundaries: simpler
reasoning, and the cond-subtract is one borrow chain.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import LIMB_BITS, LIMB_MASK, FieldParams

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


# ---------------------------------------------------------------------------
# Host <-> limb conversion (numpy; O(n) python-free via vectorized shifts)
# ---------------------------------------------------------------------------

def ints_to_limbs(values, n_limbs):
    """List/array of python ints -> (L, n) uint32 little-endian 16-bit limbs.

    Hot boundary op (every host->device crossing): one `int.to_bytes` per
    value (C-speed) + a single frombuffer, no per-limb Python loop.
    """
    nb = n_limbs * (LIMB_BITS // 8)
    # int.to_bytes raises OverflowError if a value does not fit (or is
    # negative) — same contract as the old per-limb assert
    buf = b"".join(int(v).to_bytes(nb, "little") for v in values)
    if not values:
        return np.zeros((n_limbs, 0), dtype=np.uint32)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(values), n_limbs)
    return np.ascontiguousarray(arr.T).astype(np.uint32)


def limbs_to_ints(arr):
    """(L, n) limbs -> list of python ints (one from_bytes per value)."""
    arr = np.asarray(arr)
    L = arr.shape[0]
    flat = arr.reshape(L, -1).T.astype("<u2")     # (n, L) 16-bit rows
    nb = L * (LIMB_BITS // 8)
    buf = flat.tobytes()
    return [int.from_bytes(buf[j * nb:(j + 1) * nb], "little")
            for j in range(flat.shape[0])]


# ---------------------------------------------------------------------------
# Field context: device-resident constants for one prime field
# ---------------------------------------------------------------------------

class FieldCtx:
    """Precomputed device constants for one `FieldParams`.

    Shapes are (L, 1) so they broadcast against (L, *batch) operands.
    """

    _cache = {}

    def __new__(cls, fp: FieldParams):
        if fp.modulus in cls._cache:
            return cls._cache[fp.modulus]
        self = super().__new__(cls)
        cls._cache[fp.modulus] = self
        L = fp.n_limbs
        self.fp = fp
        self.L = L
        self.mod_int = fp.modulus
        # -modulus^-1 mod R (full-width Montgomery constant)
        n_prime = (-pow(fp.modulus, -1, fp.mont_r)) % fp.mont_r
        # constants are NUMPY arrays: they trace as literals, so the same
        # field code runs under jit, vmap, shard_map AND inside Pallas
        # kernels (which cannot capture device arrays)
        self.mod = ints_to_limbs([fp.modulus], L)
        self.n_prime = ints_to_limbs([n_prime], L)
        self.r2 = ints_to_limbs([fp.mont_r2], L)
        self.one_m = ints_to_limbs([fp.mont_one], L)
        self.zero = ints_to_limbs([0], L)
        # exponent bits for Fermat inversion, LSB-first (static length)
        e = fp.modulus - 2
        self.inv_bits = np.array([(e >> i) & 1 for i in range(fp.n_bits)],
                                 dtype=np.uint32)
        return self

    # -- convenience: host ints <-> device Montgomery form --
    def to_mont(self, values):
        a = jnp.asarray(ints_to_limbs([v % self.mod_int for v in values],
                                      self.L))
        return _to_mont_jit(a, self)

    def from_mont(self, a):
        return limbs_to_ints(_from_mont_jit(a, self))


# ---------------------------------------------------------------------------
# Carry / borrow chains (lax.scan over the limb axis: carry chains are
# inherently sequential in limb index but full-batch-wide per step; scan keeps
# the XLA graph tiny — these functions are inlined ~40x into each EC add)
# ---------------------------------------------------------------------------

# Unroll factors: TPU while-loops cost ~10us per iteration of overhead, which
# dwarfs the tiny per-step carry work, so short carry/borrow chains unroll
# fully (~5 primitives per limb); the CIOS product scan unrolls partially
# (its body is larger).
import os as _os

_UNROLL = int(_os.environ.get("BP_UNROLL", "8"))
_CIOS_UNROLL = int(_os.environ.get("BP_CIOS_UNROLL", "4"))


def _align(a, b):
    """Expand batch dims (inserted after the leading limb axis) so the two
    limb arrays broadcast; limbs-first layout means numpy right-alignment
    would misalign the limb axis."""
    nd = max(a.ndim, b.ndim)
    while a.ndim < nd:
        a = a[:, None]
    while b.ndim < nd:
        b = b[:, None]
    return a, b


def _carry_norm(cols, out_len):
    """Propagate carries over relaxed columns (< 2^26) -> canonical 16-bit
    limbs, keeping `out_len` limbs (higher carries must be provably zero or
    deliberately dropped by the caller)."""
    K = cols.shape[0]
    if K < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - K,) + cols.shape[1:], U32)], axis=0)
    elif K > out_len:
        cols = cols[:out_len]

    if _UNROLL >= cols.shape[0]:
        # fully unrolled python loop: no scan primitive, so this path also
        # lowers inside Pallas/Mosaic kernels (scan xs/ys unsupported there)
        outs = []
        carry = jnp.zeros_like(cols[0])
        for k in range(cols.shape[0]):
            s = cols[k] + carry
            outs.append(s & MASK)
            carry = s >> LIMB_BITS
        return jnp.stack(outs, axis=0)

    def body(carry, col):
        s = col + carry
        return s >> LIMB_BITS, s & MASK

    _, out = jax.lax.scan(body, jnp.zeros_like(cols[0]), cols,
                          unroll=_UNROLL)
    return out


def _carry_sub_norm(cols, m, out_len):
    """Fused carry-normalize + conditional subtract: relaxed columns ->
    canonical limbs of (value mod-reduced by one subtraction of m if >= m).
    One scan computes both the normalized limbs and the borrow chain of
    (normalized - m); the select happens once at the end."""
    K = cols.shape[0]
    if K < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - K,) + cols.shape[1:], U32)], axis=0)
    elif K > out_len:
        cols = cols[:out_len]
    mm = m
    if mm.shape[0] < out_len:
        mm = jnp.concatenate(
            [mm, jnp.zeros((out_len - mm.shape[0],) + mm.shape[1:], U32)],
            axis=0)
    mb = jnp.broadcast_to(_align(mm, cols)[0], cols.shape)
    base = np.uint32(1 << LIMB_BITS)

    if _UNROLL >= cols.shape[0]:
        norm_l, diff_l = [], []
        carry = jnp.zeros_like(cols[0])
        borrow = jnp.zeros_like(cols[0])
        for k in range(cols.shape[0]):
            s = cols[k] + carry
            limb = s & MASK
            t = limb + base - mb[k] - borrow
            norm_l.append(limb)
            diff_l.append(t & MASK)
            carry = s >> LIMB_BITS
            borrow = 1 - (t >> LIMB_BITS)
        norm = jnp.stack(norm_l, axis=0)
        diff = jnp.stack(diff_l, axis=0)
        return jnp.where((borrow == 0)[None], diff, norm)

    def body(c, xs):
        col, mk = xs
        carry, borrow = c
        s = col + carry
        limb = s & MASK
        t = limb + base - mk - borrow
        return (s >> LIMB_BITS, 1 - (t >> LIMB_BITS)), (limb, t & MASK)

    (_, borrow), (norm, diff) = jax.lax.scan(
        body, (jnp.zeros_like(cols[0]), jnp.zeros_like(cols[0])),
        (cols, mb), unroll=_UNROLL)
    return jnp.where((borrow == 0)[None], diff, norm)


def _sub_if_ge(x, m):
    """x - m if x >= m else x, over (L', *batch) with m (L', 1). Borrow chain."""
    Lx = x.shape[0]
    if m.shape[0] < Lx:
        m = jnp.concatenate(
            [m, jnp.zeros((Lx - m.shape[0],) + m.shape[1:], U32)], axis=0)
    base = np.uint32(1 << LIMB_BITS)
    mb = jnp.broadcast_to(_align(m, x)[0], x.shape)

    if _UNROLL >= Lx:
        outs = []
        borrow = jnp.zeros_like(x[0])
        for k in range(Lx):
            t = x[k] + base - mb[k] - borrow
            outs.append(t & MASK)
            borrow = 1 - (t >> LIMB_BITS)
        diff = jnp.stack(outs, axis=0)
        return jnp.where((borrow == 0)[None], diff, x)

    def body(borrow, xs):
        xk, mk = xs
        t = xk + base - mk - borrow
        return 1 - (t >> LIMB_BITS), t & MASK

    borrow, diff = jax.lax.scan(body, jnp.zeros_like(x[0]), (x, mb),
                                unroll=_UNROLL)
    return jnp.where((borrow == 0)[None], diff, x)


# ---------------------------------------------------------------------------
# Core limb products
# ---------------------------------------------------------------------------

def _mul_columns(a, b):
    """Relaxed column sums of the schoolbook product a*b: (2L+1, *batch),
    column values < 2L * 2^17 (lo/hi-split partial products).  Scan over the
    limbs of `a`, accumulating a (Lb+1)-wide window at offset i."""
    a, b = _align(a, b)
    La, Lb = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    n_cols = La + Lb + 1
    cols0 = jnp.zeros((n_cols,) + batch, U32)
    bb = jnp.broadcast_to(b, (Lb,) + batch)
    zero_row = jnp.zeros((1,) + batch, U32)

    def body(cols, xs):
        a_i, i = xs
        p = a_i * bb                                  # (Lb, *batch), exact
        lo = jnp.concatenate([p & MASK, zero_row], axis=0)
        hi = jnp.concatenate([zero_row, p >> LIMB_BITS], axis=0)
        window = jax.lax.dynamic_slice_in_dim(cols, i, Lb + 1, axis=0)
        cols = jax.lax.dynamic_update_slice_in_dim(
            cols, window + lo + hi, i, axis=0)
        return cols, None

    cols, _ = jax.lax.scan(body, cols0,
                           (a, jnp.arange(La, dtype=jnp.int32)))
    return cols


def mul_wide(a, b):
    """Full 2L-limb canonical product (2L, *batch)."""
    return _carry_norm(_mul_columns(a, b), a.shape[0] + b.shape[0])


# ---------------------------------------------------------------------------
# Modular ops (canonical in, canonical out)
# ---------------------------------------------------------------------------

def add_mod(a, b, ctx: FieldCtx):
    L = ctx.L
    a, b = _align(a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    cols = a + jnp.broadcast_to(b, a.shape)          # < 2^17 per limb
    return _carry_sub_norm(cols, ctx.mod, L + 1)[:L]


def sub_mod(a, b, ctx: FieldCtx):
    base = np.uint32(1 << LIMB_BITS)
    a, b = _align(a, b)
    if a.shape[1:] != jnp.broadcast_shapes(a.shape[1:], b.shape[1:]):
        a = jnp.broadcast_to(
            a, a.shape[:1] + jnp.broadcast_shapes(a.shape[1:], b.shape[1:]))
    modb = jnp.broadcast_to(_align(ctx.mod, a)[0], a.shape)

    bb2 = jnp.broadcast_to(b, a.shape)
    if _UNROLL >= a.shape[0]:
        diff_l, fixed_l = [], []
        borrow = jnp.zeros_like(a[0])
        carry = jnp.zeros_like(a[0])
        for k in range(a.shape[0]):
            t = a[k] + base - bb2[k] - borrow
            d = t & MASK
            borrow = 1 - (t >> LIMB_BITS)
            s = d + modb[k] + carry
            carry = s >> LIMB_BITS
            diff_l.append(d)
            fixed_l.append(s & MASK)
        diff = jnp.stack(diff_l, axis=0)
        fixed = jnp.stack(fixed_l, axis=0)
        return jnp.where((borrow == 1)[None], fixed, diff)

    def body(c, xs):
        ak, bk, mk = xs
        borrow, carry = c
        t = ak + base - bk - borrow
        d = t & MASK
        nb = 1 - (t >> LIMB_BITS)
        s = d + mk + carry
        return (nb, s >> LIMB_BITS), (d, s & MASK)

    (borrow, _), (diff, fixed) = jax.lax.scan(
        body, (jnp.zeros_like(a[0]), jnp.zeros_like(a[0])),
        (a, bb2, modb), unroll=_UNROLL)
    return jnp.where((borrow == 1)[None], fixed, diff)


def neg_mod(a, ctx: FieldCtx):
    return sub_mod(jnp.broadcast_to(_align(ctx.zero, a)[0], a.shape), a, ctx)


_MONT_IMPL = _os.environ.get("BP_MONT_IMPL", "cios")


def mont_mul(a, b, ctx: FieldCtx):
    """Montgomery product abR^-1 mod p, canonical in/out.

    BP_MONT_IMPL selects the kernel form (NOTES.md): `cios` (default —
    fused scan), `conv` (separated REDC as three convolutions), `mxu`
    (separated REDC with the fixed-operand products as int8 MXU matmuls).
    """
    if _MONT_IMPL == "conv":
        return mont_mul_conv(a, b, ctx)
    if _MONT_IMPL == "mxu":
        return mont_mul_mxu(a, b, ctx)
    return _mont_mul_cios(a, b, ctx)


def _mont_mul_cios(a, b, ctx: FieldCtx):
    """Fused CIOS scan form: T accumulated as relaxed columns, one limb of
    `a` per iteration (scatter-free column updates via concat shifts)."""
    L = ctx.L
    a, b = _align(a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    bb = jnp.broadcast_to(b, (L,) + batch)
    modb = jnp.broadcast_to(_align(ctx.mod, bb)[0], bb.shape)
    n0inv = np.uint32(ctx.fp.n0inv)
    t0 = jnp.zeros((L + 1,) + batch, U32)

    # Fused CIOS: one scan iteration per limb of `a`; the running value t is
    # kept as RELAXED columns (< 4L*2^16 + carries, safely < 2^32) and shifted
    # one limb right per iteration.  t[0]'s low 16 bits are always exact
    # (carries only flow upward), which is all m needs.
    zero_row = jnp.zeros((1,) + batch, U32)

    def body(t, a_i):
        # scatter-free column updates (Mosaic has no scatter-add; concat
        # adds lower to plain vector ops everywhere)
        p = a_i * bb                                   # (L, batch) exact
        t = (t + jnp.concatenate([p & MASK, zero_row], axis=0)
               + jnp.concatenate([zero_row, p >> LIMB_BITS], axis=0))
        m = ((t[0] & MASK) * n0inv) & MASK
        q = m * modb
        t = (t + jnp.concatenate([q & MASK, zero_row], axis=0)
               + jnp.concatenate([zero_row, q >> LIMB_BITS], axis=0))
        carry0 = t[0] >> LIMB_BITS                     # t[0] == 0 mod 2^16
        t = jnp.concatenate([(t[1] + carry0)[None], t[2:], zero_row],
                            axis=0)
        return t, None

    if _CIOS_UNROLL >= L:
        t = t0
        for i in range(L):
            t, _ = body(t, a[i])
    else:
        t, _ = jax.lax.scan(body, t0, a, unroll=_CIOS_UNROLL)
    # t holds (a*b + m*N)/R < 2p as relaxed columns
    return _carry_sub_norm(t, ctx.mod, L + 1)[:L]


def _diag_sum(P):
    """(L, M, *batch) -> (L+M, *batch): out[k] = sum_i P[i, k-i] (the
    polynomial-product column sums) via the pad/flatten/reshape diagonal
    alignment: pad each row to length M+L, flatten, and re-view with row
    length M+L-1 — row i of the new view is row i shifted RIGHT by i — so
    the whole convolution is one reshape + one reduction with NO sequential
    scan and NO concat-shift data movement per step."""
    L, M = P.shape[0], P.shape[1]
    batch = P.shape[2:]
    D = M + L - 1
    pad = jnp.zeros((L, L) + batch, P.dtype)
    X = jnp.concatenate([P, pad], axis=1)            # (L, M+L, *batch)
    X = X.reshape((L * (M + L),) + batch)[:L * D]
    X = X.reshape((L, D) + batch)                    # row i shifted by i
    cols = jnp.sum(X, axis=0)                        # (M+L-1, *batch)
    return jnp.concatenate(
        [cols, jnp.zeros((1,) + batch, P.dtype)], axis=0)


def mont_mul_conv(a, b, ctx: FieldCtx):
    """Montgomery product via three convolutions (separated REDC), no
    sequential limb scan: T = a*b; m = T_lo * N' mod R; out = (T + m*N)/R.

    Partial products are lo/hi split so column sums stay < 2L * 2^17 and
    never overflow uint32 lanes.  ~3x the multiplies of fused CIOS but
    every op is one full-width pass — wins when the kernel is movement-
    bound, loses when ALU-bound; selected by BP_MONT_IMPL (measured on
    TPU, see NOTES.md)."""
    L = ctx.L
    a, b = _align(a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)

    def conv(x, y):
        # (L, *batch) x (L, *batch or 1) -> relaxed columns (2L, *batch)
        P = x[:, None] * y[None, :]                  # (L, L, *batch) exact
        lo = _diag_sum(P & MASK)
        hi = _diag_sum(P >> LIMB_BITS)
        return lo + jnp.concatenate(
            [jnp.zeros((1,) + lo.shape[1:], U32), hi[:-1]], axis=0)

    bshape = (L,) + (1,) * len(batch)
    nprime = jnp.broadcast_to(
        jnp.asarray(ctx.n_prime).reshape(bshape), (L,) + batch)
    modb = jnp.broadcast_to(
        jnp.asarray(ctx.mod).reshape(bshape), (L,) + batch)

    t = conv(a, b)                                   # relaxed < 2^22
    t_norm = _carry_norm(t, 2 * L)                   # canonical 2L limbs
    m = _carry_norm(conv(t_norm[:L], nprime)[:L], L)  # (T*N') mod R
    mn = conv(m, modb)                               # m*N relaxed
    total = mn + t_norm                              # < 2^23 per column
    # (T + m*N) / R: the low L limbs cancel; carry-normalize the whole
    # 2L+1 columns (low-half carries flow into the high half), keep high
    summed = _carry_norm(total, 2 * L + 1)
    return _carry_sub_norm(summed[L:], ctx.mod, L + 1)[:L]


def _mxu_tables(ctx: FieldCtx):
    """Static Toeplitz tables routing the REDC's fixed-operand products
    through the int8 MXU (measured 197 T ops/s vs ~5 T VPU int32,
    scripts/probe_vpu.py).  For y = T @ x with byte-entries T, x in
    [0, 256): bias BOTH sides by -128 so they fit int8 exactly, then
      y = (T-128)@(x-128) + 128*rowsum(T-128) + 128*sum(x-128) + 16384*L8
    — one int8 matmul (int32 accumulate, exact on any backend) plus a
    static row constant and one per-batch byte-sum reduction.

    Returns ((Ts_m, const_m), (Ts_n, const_n)): the (T_lo * N') mod R map
    (L8 x L8) and the m * N map (2*L8 x L8), L8 = 2L 8-bit limbs."""
    if hasattr(ctx, "_mxu"):
        return ctx._mxu
    L8 = 2 * ctx.L

    def bytes_le(v, n):
        return [(v >> (8 * i)) & 0xFF for i in range(n)]

    def toeplitz(limbs8, out_rows):
        T = np.zeros((out_rows, L8), np.int64)
        for k in range(out_rows):
            for i in range(L8):
                if 0 <= k - i < len(limbs8):
                    T[k, i] = limbs8[k - i]
        Ts = T - 128
        const = (128 * Ts.sum(axis=1) + 16384 * L8).astype(
            np.int32)[:, None]
        return (Ts.astype(np.int8), const)

    n_prime_int = sum(int(v) << (16 * i)
                      for i, v in enumerate(ctx.n_prime[:, 0]))
    ctx._mxu = (toeplitz(bytes_le(n_prime_int, 2 * ctx.L), L8),
                toeplitz(bytes_le(ctx.mod_int, 2 * ctx.L), 2 * L8))
    return ctx._mxu


def _mxu_apply(tables, x8):
    """(L8, *batch) byte vector -> T @ x8 as int32 columns (rows, *batch)."""
    Ts, const = tables
    batch = x8.shape[1:]
    xi = x8.astype(jnp.int32).reshape(x8.shape[0], -1)
    xs = (xi - 128).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    y = (jax.lax.dot_general(Ts, xs, dn, preferred_element_type=jnp.int32)
         + const + 128 * jnp.sum(xi - 128, axis=0, keepdims=True))
    return y.reshape((Ts.shape[0],) + batch).astype(U32)


def _u16_to_u8(a):
    """(L, *batch) 16-bit limbs -> (2L, *batch) byte limbs."""
    lo = a & 0xFF
    hi = (a >> 8) & 0xFF
    out = jnp.stack([lo, hi], axis=1)
    return out.reshape((2 * a.shape[0],) + a.shape[1:])


def _u8cols_to_u16cols(c):
    """(2K, *batch) relaxed byte-base columns -> (K, *batch) 16-bit-base
    relaxed columns (pairs combined; values grow by <= 256x, still < 2^30
    for byte columns < 2^22)."""
    pairs = c.reshape((c.shape[0] // 2, 2) + c.shape[1:])
    return pairs[:, 0] + (pairs[:, 1] << 8)


def mont_mul_mxu(a, b, ctx: FieldCtx):
    """Separated REDC with the two fixed-operand products on the MXU:
    T = a*b (VPU scan columns — both operands vary; the conv/diag_sum form
    measured 18x slower from intermediate materialization), then
    m = (T_lo * N') mod R and m*N as int8 Toeplitz matmuls."""
    L = ctx.L
    a, b = _align(a, b)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)

    tm, tn = _mxu_tables(ctx)
    t = _mul_columns(a, b)                           # (2L+1,) relaxed
    t_norm = _carry_norm(t, 2 * L)                   # canonical 16-bit
    x8 = _u16_to_u8(t_norm[:L])                      # (2L,) bytes
    m_cols = _mxu_apply(tm, x8)                      # byte-base, < 2^22
    # canonicalize m to bytes mod R (drop carry past L8 limbs)
    m8 = _carry_norm8_u32(m_cols, 2 * L)
    mn_cols = _mxu_apply(tn, m8)                     # (4L,) byte-base
    mn16 = _u8cols_to_u16cols(mn_cols)               # (2L,) 16-bit-base
    total = mn16 + t_norm
    summed = _carry_norm(total, 2 * L + 1)
    return _carry_sub_norm(summed[L:], ctx.mod, L + 1)[:L]


def _carry_norm8_u32(cols, out_len):
    """Byte-base carry normalization over uint32 relaxed columns."""
    K = cols.shape[0]
    if K < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - K,) + cols.shape[1:], U32)], axis=0)
    elif K > out_len:
        cols = cols[:out_len]
    outs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(out_len):
        s = cols[k] + carry
        outs.append(s & 0xFF)
        carry = s >> 8
    return jnp.stack(outs, axis=0)


def mont_sq(a, ctx: FieldCtx):
    return mont_mul(a, a, ctx)


def mul_small(a, k: int, ctx: FieldCtx):
    """a * k for a small static python int k, via double-and-add of mod-adds
    (cheaper than a Montgomery mul for the curve constants b3, 3*b3)."""
    assert k > 0
    bits = bin(k)[2:]
    acc = a
    for bit in bits[1:]:
        acc = add_mod(acc, acc, ctx)
        if bit == "1":
            acc = add_mod(acc, a, ctx)
    return acc


def is_zero(a):
    """(batch,) bool mask."""
    return jnp.all(a == 0, axis=0)


def inv_mont(a, ctx: FieldCtx):
    """Batched Montgomery-domain inversion via Fermat (a^(p-2)), lax.scan over
    the static exponent bits.  The device analog of `batch_invert`
    (`/root/reference/src/ipp.rs:295`) — Fermat is fully data-parallel where
    the Montgomery trick is sequential, the right trade on a TPU."""
    one = jnp.broadcast_to(_align(ctx.one_m, a)[0], a.shape)

    def body(carry, bit):
        acc, base = carry
        mult = mont_mul(acc, base, ctx)
        acc = jnp.where((bit == 1), mult, acc)
        base = mont_sq(base, ctx)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (one, a), ctx.inv_bits)
    return acc


# ---------------------------------------------------------------------------
# F_r vector helpers for the protocol hot paths (plain domain)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1,))
def _to_mont_jit(a, ctx):
    return mont_mul(a, jnp.broadcast_to(ctx.r2, a.shape), ctx)


@partial(jax.jit, static_argnums=(1,))
def _from_mont_jit(a, ctx):
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(a, one, ctx)


def get_digits(scalars, c: int, n_windows: int):
    """Unsigned base-2^c digit decomposition of plain-form scalar limbs.

    scalars: (Lr, n) canonical 16-bit limbs -> (n_windows, n) int32 digits.
    c must be <= 16 so a digit spans at most two limbs.
    """
    assert c <= LIMB_BITS
    Lr, = scalars.shape[:1]
    digits = []
    for w in range(n_windows):
        off = c * w
        j, sh = off // LIMB_BITS, off % LIMB_BITS
        lo = scalars[j] >> sh
        if sh + c > LIMB_BITS and j + 1 < Lr:
            lo = lo | (scalars[j + 1] << (LIMB_BITS - sh))
        digits.append(lo & np.uint32((1 << c) - 1))
    return jnp.stack(digits, axis=0).astype(jnp.int32)
