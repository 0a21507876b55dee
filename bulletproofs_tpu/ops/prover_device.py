"""Device-resident R1CS prover vector path + implicit-basis IPA.

This is the TPU-native evaluation of the prover's O(n) work
(`/root/reference/src/r1cs/prover.rs:322-593`): the z-fold of the constraint
rows (`prover.rs:142-184`), the l(x)/r(x) degree-3 vector polynomials and
t(x) = <l, r> (`prover.rs:458-488`, `utils/vector_poly.rs:79-97`), the
witness-commitment MSMs (`prover.rs:336-366`), and the whole inner-product
argument (`src/ipp.rs:35-202`).  The host keeps only what is inherently
serial and tiny: circuit construction, the Fiat-Shamir transcript, blinding
draws, and the handful of single-point Pedersen commitments.

Design notes (TPU-first, no reference analog):

- **Implicit-basis IPA.**  The reference folds the G/H basis vectors every
  round with per-element 2-point ladders (`ipp.rs:115-130`) — 500+
  sequential group ops per element.  Here the folded bases are never
  materialized: after j rounds the folded basis is G'_i = sum_{k = i mod
  n_j} rG_k G_k, where rG_k is a per-ORIGINAL-point running product of
  challenges (the prover-side analog of the verifier's s-vector,
  `ipp.rs:262-315`).  Each round's L/R commitments then become ONE
  fixed-shape two-scalar-set Pippenger MSM over the ORIGINAL [G | H | Q]
  point table with masked/tiled scalar vectors.  Every round reuses the
  same compiled MSM kernel (no shrinking-shape compile storm), all EC work
  is bucket accumulation (~40 adds/point instead of ~500), and the masked
  half of each scalar vector is exactly zero so the digit-0 exclusion in
  the scheduler skips it for free.

- **Shape discipline.**  Everything is padded to the circuit's power-of-two
  n and stays (Lr, n); per-round halving is expressed as static reshapes
  over the same buffers, so the only per-size compiles are cheap elementwise
  kernels (persistently cached).

- **z-fold as gather + dense tree-sum.**  `flattened_constraints` is a
  sparse accumulation over constraint terms.  Scatter-adds serialize on
  TPU, so the host lays the terms out per-variable as a dense (n, T_max)
  table at prove time (list bookkeeping only, no field math) and the device
  evaluates w[v] = sum_t z^(row[v,t]+1) * coeff[v,t] with one row-gather of
  z-powers and a T_max-step tree sum.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_PROFILE = os.environ.get("BP_PROFILE", "") == "1"


class _Prof:
    """Cheap stage timers (BP_PROFILE=1): accumulated per label."""

    def __init__(self):
        self.acc = {}

    def add(self, label, dt):
        self.acc[label] = self.acc.get(label, 0.0) + dt

    def dump(self, header):
        if self.acc:
            items = sorted(self.acc.items(), key=lambda kv: -kv[1])
            print(f"BP_PROFILE {header}: " + "  ".join(
                f"{k}={v*1e3:.0f}ms" for k, v in items), flush=True)
        self.acc = {}


_prof = _Prof()


class _timed:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        if _PROFILE:
            self.t0 = time.time()

    def __exit__(self, *a):
        if _PROFILE:
            _prof.add(self.label, time.time() - self.t0)
        return False

from ..config import curve
from . import ec_jax as ej
from . import field_jax as fj
from . import msm as msm_mod
from .field_host import Scalar

from functools import partial

# Minimum padded circuit size for the device prover path.
DEVICE_PROVER_MIN_N = int(os.environ.get("BP_PROVER_DEVICE_MIN", "256"))
# auto-policy crossover to the device prover (explicit jax mode ignores it)
DEVICE_PROVER_AUTO_MIN = int(
    os.environ.get("BP_PROVER_DEVICE_AUTO_MIN", "16384"))


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------

def _to_plain(x, fr):
    one = jnp.zeros_like(x).at[0].set(1)
    return fj.mont_mul(x, one, fr)


def _mont(fr, vals):
    """Host ints -> (Lr, n) Montgomery device array."""
    return fr.to_mont([v.v if hasattr(v, "v") else int(v) for v in vals])


def _inner_mont(a, b, fr):
    """<a, b> over F_r, Montgomery in/out: elementwise mul + halving tree."""
    prod = fj.mont_mul(a, b, fr)
    n = prod.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        left = prod[..., :half]
        right = prod[..., half:n]
        if right.shape[-1] < half:
            right = jnp.concatenate(
                [right, jnp.zeros(right.shape[:-1] +
                                  (half - right.shape[-1],), right.dtype)],
                axis=-1)
        prod = fj.add_mod(left, right, fr)
        n = half
    return prod                                     # (Lr, ..., 1)


@partial(jax.jit, static_argnums=(1, 2))
def _pow_table(x_m, q, fr):
    """x (Lr, 1) Montgomery -> (Lr, q) powers [x^1, x^2, ..., x^q].

    log2(q) full-width passes: power-of-two squarings of x combined per
    index bit (data-parallel; a sequential scan would serialize q steps)."""
    n_bits = max(1, (q - 1).bit_length())
    out = jnp.broadcast_to(x_m, (fr.L, q))          # x^1 * (rest of bits)
    iota = jnp.arange(q, dtype=jnp.uint32)
    sq = x_m
    for k in range(n_bits):
        mult = fj.mont_mul(out, sq, fr)
        out = jnp.where(((iota >> k) & 1) == 1, mult, out)
        if k + 1 < n_bits:
            sq = fj.mont_mul(sq, sq, fr)
    return out


# ---------------------------------------------------------------------------
# z-fold of constraints (device flattened_constraints, prover.rs:142-184)
# ---------------------------------------------------------------------------

def build_zfold_tables(constraints, n, m, include_one=False):
    """Host prep: per-variable dense term tables (list bookkeeping only).

    Returns {kind: (rows, valid, coeffs, T, width)} with width n for L/R/O
    and m for V; T = max terms per variable (tiny for real circuits).
    Sign: V (and the verifier's ONE/constant, `verifier.rs:181-184`)
    coefficients enter negatively — handled by the caller.
    include_one: also collect the constant terms (verifier wc,
    `verifier.rs:149-193`; the prover skips them, `prover.rs:142-184`).
    """
    from ..r1cs.linear_combination import (COMMITTED, MULT_LEFT, MULT_OUTPUT,
                                           MULT_RIGHT, ONE)
    per = {MULT_LEFT: [[] for _ in range(n)],
           MULT_RIGHT: [[] for _ in range(n)],
           MULT_OUTPUT: [[] for _ in range(n)],
           COMMITTED: [[] for _ in range(m)]}
    if include_one:
        per[ONE] = [[]]
    from ..r1cs.linear_combination import ONE as _ONE
    for q_i, lc in enumerate(constraints):
        for var, coeff in lc.terms:
            bucket = per.get(var.kind)
            if bucket is not None:
                idx = 0 if var.kind == _ONE else var.index
                bucket[idx].append((q_i, coeff))
    out = {}
    for kind, table in per.items():
        T = max(1, max((len(t) for t in table), default=1))
        width = len(table)
        rows = np.zeros((width, T), dtype=np.int32)
        valid = np.zeros((width, T), dtype=np.uint32)
        coeffs = []
        for v_i, terms in enumerate(table):
            for t_i, (q_i, cv) in enumerate(terms):
                rows[v_i, t_i] = q_i
                valid[v_i, t_i] = 1
                coeffs.append(cv)
            coeffs.extend([0] * (T - len(terms)))
        out[kind] = (rows, valid, coeffs, T, width)
    return out


def zfold_device(tables, z, q, fr, padded_n):
    """Device z-fold: w[v] = sum_t z^(row+1)*coeff.  Returns mont-form
    wL, wR, wO each (Lr, padded_n) and wV (Lr, m) (V with negated sign)."""
    from ..r1cs.linear_combination import (COMMITTED, MULT_LEFT, MULT_OUTPUT,
                                           MULT_RIGHT)
    z_m = _mont(fr, [z])
    zpow = _pow_table(z_m, max(q, 1), fr)            # (Lr, q): z^1..z^q
    zpow_rows = jnp.transpose(zpow, (1, 0))          # (q, Lr) for row gather

    outs = {}
    for kind in (MULT_LEFT, MULT_RIGHT, MULT_OUTPUT, COMMITTED):
        rows, valid, coeffs, T, width = tables[kind]
        coeff_m = fj._to_mont_jit(jnp.asarray(
            fj.ints_to_limbs(coeffs, fr.L)), fr)     # (Lr, width*T)
        w = _zfold_kernel(zpow_rows, jnp.asarray(rows),
                          jnp.asarray(valid), coeff_m, fr, T, width)
        outs[kind] = w
    wL, wR, wO = (outs[MULT_LEFT], outs[MULT_RIGHT], outs[MULT_OUTPUT])
    wV = fj.neg_mod(outs[COMMITTED], fr)             # V terms subtract

    def pad(w):
        if w.shape[-1] < padded_n:
            w = jnp.concatenate(
                [w, jnp.zeros((fr.L, padded_n - w.shape[-1]), w.dtype)],
                axis=-1)
        return w
    return pad(wL), pad(wR), pad(wO), wV


@partial(jax.jit, static_argnums=(4, 5, 6))
def _zfold_kernel(zpow_rows, rows, valid, coeff_m, fr, T, width):
    zp = zpow_rows[rows.reshape(-1)]                 # (width*T, Lr)
    zp = jnp.transpose(zp, (1, 0))                   # (Lr, width*T)
    prod = fj.mont_mul(zp, coeff_m, fr)              # (Lr, width*T)
    prod = prod.reshape(fr.L, width, T)
    prod = jnp.where(valid[None] == 1, prod, 0)
    # tree-sum over the T axis (T is tiny)
    t = T
    while t > 1:
        half = (t + 1) // 2
        left = prod[..., :half]
        right = prod[..., half:t]
        if right.shape[-1] < half:
            right = jnp.concatenate(
                [right, jnp.zeros(right.shape[:-1] +
                                  (half - right.shape[-1],), right.dtype)],
                axis=-1)
        prod = fj.add_mod(left, right, fr)
        t = half
    return prod[..., 0]                              # (Lr, width)


# ---------------------------------------------------------------------------
# l(x)/r(x)/t(x) vector-poly kernels (prover.rs:458-488)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(9,))
def _t_poly_kernel(aL, aR, aO, sL, sR, wL, wR, wO, y_m, fr):
    """All inputs (Lr, N) Montgomery (N = padded_n), y (Lr, 1).

    Returns (t1..t6 each (Lr, 1) mont, plus the l/r coefficient vectors
    needed later for l(x), r(x) evaluation)."""
    N = aL.shape[-1]
    y_pows = _pow_shifted(y_m, N, fr)                # [1, y, .., y^{N-1}]
    y_inv  = fj.inv_mont(y_m, fr)
    y_inv_pows = _pow_shifted(y_inv, N, fr)

    l1 = fj.add_mod(aL, fj.mont_mul(y_inv_pows, wR, fr), fr)
    l2 = aO
    l3 = sL
    r0 = fj.sub_mod(wO, y_pows, fr)
    r1 = fj.add_mod(fj.mont_mul(y_pows, aR, fr), wL, fr)
    r3 = fj.mont_mul(y_pows, sR, fr)

    # t(x) = <l, r> with l0 = 0, r2 = 0 (special_inner_product,
    # vector_poly.rs:79-97): 9 pairwise inner products, one stacked pass
    lhs = jnp.stack([l1, l1, l2, l2, l3, l1, l3, l2, l3], axis=1)
    rhs = jnp.stack([r0, r1, r0, r1, r0, r3, r1, r3, r3], axis=1)
    ips = _inner_mont(lhs, rhs, fr)[..., 0]          # (Lr, 9)
    t1 = ips[:, 0:1]
    t2 = fj.add_mod(ips[:, 1:2], ips[:, 2:3], fr)
    t3 = fj.add_mod(ips[:, 3:4], ips[:, 4:5], fr)
    t4 = fj.add_mod(ips[:, 5:6], ips[:, 6:7], fr)
    t5 = ips[:, 7:8]
    t6 = ips[:, 8:9]
    t16 = jnp.concatenate([t1, t2, t3, t4, t5, t6], axis=1)
    return t16, l1, l2, l3, r0, r1, r3, y_inv_pows


@partial(jax.jit, static_argnums=(1, 2))
def _pow_shifted(x_m, n, fr):
    """[1, x, x^2, ..., x^{n-1}] (Lr, n) from x (Lr, 1) Montgomery."""
    one = jnp.broadcast_to(jnp.asarray(fr.one_m), (fr.L, 1))
    if n == 1:
        return one
    return jnp.concatenate([one, _pow_table(x_m, n - 1, fr)], axis=-1)


@partial(jax.jit, static_argnums=(7,))
def _lr_eval_kernel(l1, l2, l3, r0, r1, r3, x_m, fr):
    """l(x) = x(l1 + x(l2 + x l3)); r(x) = r0 + x(r1 + x^2 r3)."""
    lx = fj.mont_mul(
        x_m, fj.add_mod(l1, fj.mont_mul(
            x_m, fj.add_mod(l2, fj.mont_mul(x_m, l3, fr), fr), fr), fr), fr)
    x2 = fj.mont_mul(x_m, x_m, fr)
    rx = fj.add_mod(r0, fj.mont_mul(
        x_m, fj.add_mod(r1, fj.mont_mul(x2, r3, fr), fr), fr), fr)
    return lx, rx


# ---------------------------------------------------------------------------
# Implicit-basis IPA (device create_ipp — ipp.rs:35-202, same transcript)
# ---------------------------------------------------------------------------

def _swap_halves(A, n_j):
    """(Lr, n): exchange the two halves of every contiguous n_j block."""
    Lr, n = A.shape
    half = n_j // 2
    Ar = A.reshape(Lr, n // n_j, 2, half)
    return Ar[:, :, ::-1, :].reshape(Lr, n)


@partial(jax.jit, static_argnums=(4, 5))
def _ipa_round_scalars(A, B, rG, rH, n_j, fr):
    """Build the round's L/R MSM scalar sets over the ORIGINAL [G|H|Q]
    table.  Returns plain-form (2, Lr, 2n+2) scalars; the final +2 lanes
    are [c, 0-pad] per set (c_L for L, c_R for R) aligned with a point
    table [G | H | Q | identity]."""
    Lr, n = A.shape
    half = n_j // 2
    bit = jnp.asarray(np.tile(
        np.r_[np.zeros(half, np.uint32), np.ones(half, np.uint32)],
        n // n_j))

    a_j = A[:, :n_j]
    b_j = B[:, :n_j]
    c_L = _inner_mont(a_j[:, :half], b_j[:, half:], fr)
    c_R = _inner_mont(a_j[:, half:], b_j[:, :half], fr)

    swapA = _swap_halves(A, n_j)
    swapB = _swap_halves(B, n_j)
    prodG = fj.mont_mul(swapA, rG, fr)
    prodH = fj.mont_mul(swapB, rH, fr)
    zero = jnp.zeros((Lr, 1), jnp.uint32)

    sG_L = jnp.where(bit == 1, prodG, 0)
    sG_R = jnp.where(bit == 0, prodG, 0)
    sH_L = jnp.where(bit == 0, prodH, 0)
    sH_R = jnp.where(bit == 1, prodH, 0)

    L_scal = jnp.concatenate([sG_L, sH_L, c_L, zero], axis=-1)
    R_scal = jnp.concatenate([sG_R, sH_R, c_R, zero], axis=-1)
    # -> plain form (limbs stay on axis 0 for the kernels), stack sets last
    return jnp.stack([_to_plain(L_scal, fr), _to_plain(R_scal, fr)],
                     axis=0)                         # (2, Lr, 2n+2)


@partial(jax.jit, static_argnums=(6, 7))
def _ipa_round_update(A, B, rG, rH, u_m, u_inv_m, n_j, fr):
    Lr, n = A.shape
    half = n_j // 2
    bit = jnp.asarray(np.tile(
        np.r_[np.zeros(half, np.uint32), np.ones(half, np.uint32)],
        n // n_j))
    swapA = _swap_halves(A, n_j)
    swapB = _swap_halves(B, n_j)
    lowA = jnp.where(bit == 1, swapA, A)
    highA = jnp.where(bit == 1, A, swapA)
    lowB = jnp.where(bit == 1, swapB, B)
    highB = jnp.where(bit == 1, B, swapB)
    A2 = fj.add_mod(fj.mont_mul(lowA, u_m, fr),
                    fj.mont_mul(highA, u_inv_m, fr), fr)
    B2 = fj.add_mod(fj.mont_mul(lowB, u_inv_m, fr),
                    fj.mont_mul(highB, u_m, fr), fr)
    uu = jnp.where(bit == 1, jnp.broadcast_to(u_m, rG.shape),
                   jnp.broadcast_to(u_inv_m, rG.shape))
    uu_inv = jnp.where(bit == 1, jnp.broadcast_to(u_inv_m, rH.shape),
                       jnp.broadcast_to(u_m, rH.shape))
    rG2 = fj.mont_mul(rG, uu, fr)
    rH2 = fj.mont_mul(rH, uu_inv, fr)
    return A2, B2, rG2, rH2


@partial(jax.jit, static_argnums=(6, 7))
def _ipa_round_step(A, B, rG, rH, u_p, u_inv_p, n_j, fr):
    """One dispatch for 'apply round j's fold, then build round j+1's L/R
    scalar sets': merges the standalone `_ipa_round_update` call and the
    two `to_mont` conversions of the challenge into `_ipa_round_scalars`'
    dispatch — 4 device calls per round become 1 (+ the MSM), saving
    ~2-3 tunnel RTTs x log2(n) rounds per proof (NOTES.md: ~30 ms each).
    u_p/u_inv_p are the previous challenge as PLAIN-form (Lr, 1) limbs
    (host int -> limbs is free); the fold block size is 2*n_j.  Byte-
    identical to the unmerged sequence (same update/scalars algebra, same
    in-jit to_mont math as `field_jax._to_mont_jit`)."""
    u_m = fj.mont_mul(u_p, jnp.broadcast_to(fr.r2, u_p.shape), fr)
    u_inv_m = fj.mont_mul(u_inv_p, jnp.broadcast_to(fr.r2, u_inv_p.shape),
                          fr)
    A, B, rG, rH = _ipa_round_update(A, B, rG, rH, u_m, u_inv_m,
                                     2 * n_j, fr)
    scal2 = _ipa_round_scalars(A, B, rG, rH, n_j, fr)
    return scal2, A, B, rG, rH


@partial(jax.jit, static_argnums=(4,))
def _ipa_final_step(A, B, u_p, u_inv_p, fr):
    """Apply the LAST round's fold (block size 2) and return a, b as
    plain-form limbs — the tail of the per-round loop in one dispatch."""
    u_m = fj.mont_mul(u_p, jnp.broadcast_to(fr.r2, u_p.shape), fr)
    u_inv_m = fj.mont_mul(u_inv_p, jnp.broadcast_to(fr.r2, u_inv_p.shape),
                          fr)
    A, B, _, _ = _ipa_round_update(A, B, A, B, u_m, u_inv_m, 2, fr)
    one_a = jnp.zeros_like(A[:, :1]).at[0].set(1)
    return (fj.mont_mul(A[:, :1], one_a, fr),
            fj.mont_mul(B[:, :1], one_a, fr))


# ---------------------------------------------------------------------------
# FUSED device IPA: all log2(n) rounds + the Fiat-Shamir transcript in ONE
# jitted dispatch (VERDICT r3 tasks 2/9).  The per-round host round-trip
# (2 calls x ~30 ms tunnel RTT x log n rounds) was the device prover's
# latency floor; with the STROBE state machine on device
# (ops/transcript_device.py) the only host contact is one upload and one
# download per IPA.
# ---------------------------------------------------------------------------

_fused_memo = {}


def _tree_sum_mod(prod, fr):
    """Halving-tree sum over the last axis of an (Lr, ..., n) mod-r array."""
    n = prod.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        left = prod[..., :half]
        right = prod[..., half:n]
        if right.shape[-1] < half:
            right = jnp.concatenate(
                [right, jnp.zeros(right.shape[:-1] +
                                  (half - right.shape[-1],), right.dtype)],
                axis=-1)
        prod = fj.add_mod(left, right, fr)
        n = half
    return prod


def _round_masks_traced(n, j, lg_n):
    """Traced-round-index analogs of the static n_j block masks: after j
    rounds the live block size is n_j = n >> j; bit_i = (i >> (lg_n-1-j))&1
    marks the high half of each block, partner_i = i XOR (n_j/2)."""
    iota = jnp.arange(n, dtype=jnp.int32)
    sh = jnp.int32(lg_n - 1) - j.astype(jnp.int32)
    bit = (jnp.right_shift(iota, sh) & 1).astype(jnp.uint32)
    half = jnp.left_shift(jnp.int32(1), sh)
    partner = iota ^ half
    return iota, bit, half, partner


def _ipa_round_scalars_traced(A, B, rG, rH, j, lg_n, fr):
    """`_ipa_round_scalars` with a TRACED round index (fori-loop body form;
    identical algebra — fused-vs-per-round byte equality is pinned by
    tests/test_ipa_fused.py)."""
    Lr, n = A.shape
    iota, bit, half, partner = _round_masks_traced(n, j, lg_n)
    idx = jnp.broadcast_to(partner[None, :], (Lr, n))
    swapA = jnp.take_along_axis(A, idx, axis=1)
    swapB = jnp.take_along_axis(B, idx, axis=1)
    lo = iota < half                      # block-0 low half only
    c_L = _tree_sum_mod(
        jnp.where(lo[None], fj.mont_mul(A, swapB, fr), 0), fr)
    c_R = _tree_sum_mod(
        jnp.where(lo[None], fj.mont_mul(swapA, B, fr), 0), fr)
    prodG = fj.mont_mul(swapA, rG, fr)
    prodH = fj.mont_mul(swapB, rH, fr)
    zero = jnp.zeros((Lr, 1), jnp.uint32)
    sG_L = jnp.where(bit == 1, prodG, 0)
    sG_R = jnp.where(bit == 0, prodG, 0)
    sH_L = jnp.where(bit == 0, prodH, 0)
    sH_R = jnp.where(bit == 1, prodH, 0)
    L_scal = jnp.concatenate([sG_L, sH_L, c_L, zero], axis=-1)
    R_scal = jnp.concatenate([sG_R, sH_R, c_R, zero], axis=-1)
    return jnp.stack([_to_plain(L_scal, fr), _to_plain(R_scal, fr)],
                     axis=0)                          # (2, Lr, 2n+2)


def _ipa_round_update_traced(A, B, rG, rH, u_m, u_inv_m, j, lg_n, fr):
    """`_ipa_round_update` with a traced round index."""
    Lr, n = A.shape
    _, bit, _, partner = _round_masks_traced(n, j, lg_n)
    idx = jnp.broadcast_to(partner[None, :], (Lr, n))
    swapA = jnp.take_along_axis(A, idx, axis=1)
    swapB = jnp.take_along_axis(B, idx, axis=1)
    lowA = jnp.where(bit == 1, swapA, A)
    highA = jnp.where(bit == 1, A, swapA)
    lowB = jnp.where(bit == 1, swapB, B)
    highB = jnp.where(bit == 1, B, swapB)
    A2 = fj.add_mod(fj.mont_mul(lowA, u_m, fr),
                    fj.mont_mul(highA, u_inv_m, fr), fr)
    B2 = fj.add_mod(fj.mont_mul(lowB, u_inv_m, fr),
                    fj.mont_mul(highB, u_m, fr), fr)
    uu = jnp.where(bit == 1, jnp.broadcast_to(u_m, rG.shape),
                   jnp.broadcast_to(u_inv_m, rG.shape))
    uu_inv = jnp.where(bit == 1, jnp.broadcast_to(u_inv_m, rH.shape),
                       jnp.broadcast_to(u_m, rH.shape))
    return (A2, B2, fj.mont_mul(rG, uu, fr), fj.mont_mul(rH, uu_inv, fr))


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def _ipa_fused_jit(state, pts, A, B, rG, rH, ctx, c, n_rounds, affine,
                   lg_n, pos, pos_begin, cur_flags):
    """One dispatch for the whole IPA: per round, build the L/R scalar sets
    (implicit basis), run the 2-set bucket MSM with a pure-device combine,
    serialize L/R, absorb them into the device transcript, squeeze the
    challenge, and fold.  Returns (lr_bytes (lg_n, 2, 2mb+1), a_plain,
    b_plain, final_strobe_state, max_occupancy).

    Round 1 is traced at the caller's transcript positions; rounds 2..lg_n
    run as a lax.fori_loop — the STROBE registers are round-invariant after
    the first challenge (a PRF squeeze always leaves pos = modbytes,
    pos_begin = 0), so ONE compiled body serves every round.  (The
    fully-unrolled form produced a 32 MB MLIR module that the remote TPU
    compile helper OOM-killed.)"""
    from .transcript_device import DeviceTranscript, serialize_points
    fr = ctx.fr
    n = A.shape[-1]
    W = -(-ctx.cv.fr.n_bits // c)
    plan = msm_mod.window_plan(ctx, c, n_sets=2, dup=msm_mod._use_dup())
    PB = 2 * ctx.cv.modbytes + 1

    def msm_round(scal2):
        digits = msm_mod._digits_multi(scal2, ctx, c)
        buckets, occ = msm_mod.bucket_accumulate(
            pts, digits, ctx, c, n_rounds, plan=plan, affine=affine)
        # BARRIER-SEEDED combine tail: the plain fori-loop combine returns
        # corrupted points inside this composed program on real TPU
        # hardware while the buckets themselves verify bit-exact (hardware
        # erratum, NOTES.md round 4; staged proof in
        # scripts/hw_fused_probe.py).  The round-4 python-unrolled
        # workaround was byte-correct but uncompilable through the tunnel
        # (>30 min); the _fused variants keep the fori forms and barrier
        # every loop seed instead (msm.py, "Barrier-seeded combine tail").
        rowsum, colsum = msm_mod.bucket_rowcol_fused(buckets, ctx, c)
        LR = msm_mod.combine_from_rowcol_fused(rowsum, colsum, ctx, c,
                                               wins_per_set=W)
        return LR, occ                                      # (3, L, 2)

    def round_core(t, A, B, rG, rH, jj):
        scal2 = _ipa_round_scalars_traced(A, B, rG, rH, jj, lg_n, fr)
        LR, occ = msm_round(scal2)
        pb = serialize_points(LR, ctx)                      # (2, PB)
        t.commit_point_bytes(b"L", pb[0])
        t.commit_point_bytes(b"R", pb[1])
        u_m = t.challenge_scalar_mont(b"u", ctx)
        u_inv_m = fj.inv_mont(u_m, fr)
        A, B, rG, rH = _ipa_round_update_traced(A, B, rG, rH, u_m,
                                                u_inv_m, jj, lg_n, fr)
        return A, B, rG, rH, pb, occ

    # round 1 at the snapshot positions
    t = DeviceTranscript.from_snapshot(state, pos, pos_begin, cur_flags)
    A, B, rG, rH, pb0, occ_max = round_core(t, A, B, rG, rH, jnp.int32(0))
    lr = jnp.zeros((lg_n, 2, PB), jnp.uint32).at[0].set(pb0)
    st = t.strobe.st
    inv_regs = (t.strobe.pos, t.strobe.pos_begin, t.strobe.cur_flags)

    if lg_n > 1:
        def body(jj, carry):
            A, B, rG, rH, st, lr, occ_max = carry
            tt = DeviceTranscript.from_snapshot(st, *inv_regs)
            A, B, rG, rH, pb, occ = round_core(tt, A, B, rG, rH, jj)
            # trace-time invariant: the STROBE registers after a round
            # equal the registers before it, or the loop would be wrong
            assert (tt.strobe.pos, tt.strobe.pos_begin,
                    tt.strobe.cur_flags) == inv_regs, \
                "per-round transcript schedule is not position-invariant"
            lr = jax.lax.dynamic_update_slice(
                lr, pb[None], (jj, jnp.int32(0), jnp.int32(0)))
            return (A, B, rG, rH, tt.strobe.st, lr,
                    jnp.maximum(occ_max, occ))

        A, B, rG, rH, st, lr, occ_max = jax.lax.fori_loop(
            1, lg_n, body, (A, B, rG, rH, st, lr, occ_max))

    a_p = _to_plain(A[:, :1], fr)
    b_p = _to_plain(B[:, :1], fr)
    return (lr, a_p, b_p, st, occ_max)


def create_ipp_implicit_fused(transcript, Gf_m, Hf_m, pts_dev, A, B, ctx,
                              window=None, affine=False):
    """Fused-dispatch variant of `create_ipp_implicit`: byte-identical
    proofs and transcript evolution (tests/test_ipa_fused.py), one device
    round-trip for all rounds."""
    from .transcript_device import DeviceTranscript, replay_positions
    from .ec_host import G1
    fr = ctx.fr
    n = A.shape[-1]
    lg_n = n.bit_length() - 1
    assert (1 << lg_n) == n
    mb = ctx.cv.modbytes

    transcript.innerproduct_domain_sep(n)
    snap, pos, pb_, fl = DeviceTranscript.snapshot(transcript)
    c = window or int(os.environ.get("BP_IPA_WINDOW", "0")) \
        or msm_mod.pick_window(2 * n + 2)

    key = (n, c, ctx.cv.name)
    rounds = _fused_memo.get(key, msm_mod.occupancy_guess(n + 1, ctx, c))
    while True:
        with _timed("ipa_fused_kernel"):
            out = _ipa_fused_jit(jnp.asarray(snap), pts_dev, A, B,
                                 Gf_m, Hf_m, ctx, c, rounds, affine,
                                 lg_n, pos, pb_, fl)
        with _timed("ipa_fused_fetch"):
            lr_np, a_p, b_p, final_state, occ = jax.device_get(out)
        if int(occ) <= rounds:
            break
        rounds = (int(occ) + 15) // 16 * 16
    _fused_memo[key] = rounds

    # host L/R points from the device-serialized bytes (from_bytes also
    # re-checks on-curve — a cheap integrity net over the fused kernel)
    L_vec, R_vec = [], []
    for j in range(lg_n):
        for side, vec in ((0, L_vec), (1, R_vec)):
            raw = bytes(lr_np[j, side].astype(np.uint8))
            try:
                vec.append(G1.from_bytes(raw, ctx.cv))
            except AssertionError as e:
                raise AssertionError(
                    f"fused IPA: bad {'LR'[side]} bytes at round {j}/"
                    f"{lg_n} (n={n}, c={c}, rounds={rounds}, occ={int(occ)}"
                    f", affine={affine}): {raw[:24].hex()}...: {e}") \
                    from None

    # transcript writeback: state bytes from the device, position registers
    # from a dummy replay of the (static) schedule
    sched = []
    for _ in range(lg_n):
        sched += [("msg", b"L", 2 * mb + 1), ("msg", b"R", 2 * mb + 1),
                  ("challenge", b"u", mb)]
    rp, rpb, rfl = replay_positions(transcript, sched)
    DeviceTranscript.writeback(transcript, final_state, rp, rpb, rfl)

    a = Scalar(fj.limbs_to_ints(a_p)[0])
    b = Scalar(fj.limbs_to_ints(b_p)[0])
    return L_vec, R_vec, a, b


def create_ipp_implicit(transcript, Gf_m, Hf_m, pts_dev, A, B, ctx,
                        window=None, affine=False):
    """Device IPA prover with implicit basis folding.

    pts_dev: (3, L, 2n+2) device table [G | H | Q | identity] (Montgomery).
    Gf_m/Hf_m: (Lr, n) Montgomery G/H factors (the reference's first-round
    fold-in, `ipp.rs:68-136`, becomes the s-vector initialization here).
    A, B: (Lr, n) Montgomery a/b vectors.  Returns (L_vec, R_vec, a, b).

    BP_IPA_FUSED runs ALL rounds + the Fiat-Shamir transcript in one
    dispatch (`create_ipp_implicit_fused`); =0 keeps the per-round path.
    Default "auto": fused on CPU/virtual-mesh backends (bit-exact,
    tests/test_ipa_fused.py), per-round on real TPU hardware — the fused
    program is corrupted by a TPU backend erratum the round-4/5 staged
    probes could not work around (NOTES.md round-5 ledger: three
    structurally different combine tails return byte-identical garbage
    while the same program is byte-exact on XLA-CPU at the same size).
    =1 forces the fused attempt everywhere; the from_bytes integrity net
    + per-round fallback keep even a corrupted dispatch correct.
    Edwards-serialized curves (ed25519) always take the per-round path:
    the device serializer emits Weierstrass bytes, but their transcripts
    absorb AMCL Edwards coordinates.
    """
    fused_env = os.environ.get("BP_IPA_FUSED", "auto")
    if fused_env in ("auto", ""):
        import jax
        want_fused = jax.default_backend() == "cpu"
    else:
        want_fused = fused_env != "0"
    if want_fused \
            and ctx.cv.ed_d is None \
            and (A.shape[-1], ctx.cv.name) not in _fused_unavailable:
        try:
            return create_ipp_implicit_fused(transcript, Gf_m, Hf_m,
                                             pts_dev, A, B, ctx,
                                             window=window, affine=affine)
        except Exception as e:           # pragma: no cover - hw-dependent
            # the axon compile helper OOM-kills very large fused programs
            # (NOTES.md round 4), and the round-4 hardware erratum can
            # surface as off-curve L/R bytes ("fused IPA: bad ..." — the
            # from_bytes integrity net).  In both cases nothing was
            # absorbed into the host transcript yet except the domain
            # separator, so fall back to the per-round path (hardware-
            # proven) on a FRESH clone-equivalent state.
            if "remote_compile" not in repr(e) and \
                    "RESOURCE_EXHAUSTED" not in repr(e) and \
                    "fused IPA: bad" not in repr(e):
                raise
            import sys
            print(f"BP_IPA_FUSED: compile failed for n={A.shape[-1]} "
                  f"({repr(e)[:120]}); falling back to per-round",
                  file=sys.stderr, flush=True)
            _fused_unavailable.add((A.shape[-1], ctx.cv.name))
            return _create_ipp_per_round(transcript, Gf_m, Hf_m, pts_dev,
                                         A, B, ctx, window=window,
                                         affine=affine, domain_sep=False)
    return _create_ipp_per_round(transcript, Gf_m, Hf_m, pts_dev, A, B,
                                 ctx, window=window, affine=affine)


_fused_unavailable = set()


def _create_ipp_per_round(transcript, Gf_m, Hf_m, pts_dev, A, B, ctx,
                          window=None, affine=False, domain_sep=True):
    """Per-round device IPA (2 dispatches/round; the BP_IPA_FUSED=0 path
    and the fallback when the fused program cannot compile).  domain_sep=
    False when the caller already absorbed the ipp domain separator (the
    fused path applies it before snapshotting)."""
    fr = ctx.fr
    n = A.shape[-1]
    lg_n = n.bit_length() - 1
    assert (1 << lg_n) == n

    if domain_sep:
        transcript.innerproduct_domain_sep(n)

    rG, rH = Gf_m, Hf_m
    L_vec, R_vec = [], []
    u_p = u_inv_p = None          # previous challenge, plain limbs
    n_j = n

    def _plain1(v):
        return jnp.asarray(fj.ints_to_limbs([v], fr.L))

    while n_j != 1:
        with _timed("ipa_scal"):
            if u_p is None:       # first round: no pending fold
                scal2 = _ipa_round_scalars(A, B, rG, rH, n_j, fr)
            else:                 # fold round j-1 + build round j, fused
                scal2, A, B, rG, rH = _ipa_round_step(
                    A, B, rG, rH, u_p, u_inv_p, n_j, fr)
        c = window or int(os.environ.get("BP_IPA_WINDOW", "0")) \
            or msm_mod.pick_window(2 * n + 2)
        with _timed("ipa_msm"):
            # each set has <= n+1 non-zero scalars (the masked half is 0)
            L, R = msm_mod.msm_hybrid(pts_dev, scal2, ctx, c, n_eff=n + 1,
                                      affine=affine)
        with _timed("ipa_transcript"):
            transcript.commit_point(b"L", L)
            transcript.commit_point(b"R", R)
            L_vec.append(L)
            R_vec.append(R)
            u = transcript.challenge_scalar(b"u")
            u_inv = u.inverse()
            u_p, u_inv_p = _plain1(u.v), _plain1(u_inv.v)
        n_j //= 2

    if u_p is None:               # n == 1: no rounds, nothing to fold
        a = Scalar(fr.from_mont(A[:, :1])[0])
        b = Scalar(fr.from_mont(B[:, :1])[0])
        return L_vec, R_vec, a, b
    with _timed("ipa_final"):
        a_p, b_p = _ipa_final_step(A, B, u_p, u_inv_p, fr)
    a = Scalar(fj.limbs_to_ints(a_p)[0])
    b = Scalar(fj.limbs_to_ints(b_p)[0])
    return L_vec, R_vec, a, b


def create_ipp_device(transcript, Q, G_factors, H_factors, G_vec, H_vec,
                      a_vec, b_vec):
    """Host-list adapter for the implicit-basis IPA: drop-in device path for
    `ipp.create_ipp` (same transcript schedule as `ipp.rs:35-202`)."""
    from ..config import curve
    ctx = ej.CurveCtx(curve())
    fr = ctx.fr
    Gd, affG = _pts_cache.get(list(G_vec), ctx)
    Hd, affH = _pts_cache.get(list(H_vec), ctx)
    Qd, affQ = ej.to_device_points_affine([Q], ctx)
    # the identity padding column is safe under the mixed-add kernel: its
    # scalars are always zero, so it is never scheduled into a bucket
    # round (digit-0 exclusion) — only gathered for empty slots, whose
    # result is post-selected away
    pts = jnp.concatenate(
        [Gd, Hd, Qd, jnp.asarray(ctx.identity)], axis=2)
    return create_ipp_implicit(
        transcript, _mont(fr, G_factors), _mont(fr, H_factors), pts,
        _mont(fr, a_vec), _mont(fr, b_vec), ctx,
        affine=affG and affH and affQ)


# ---------------------------------------------------------------------------
# Device prove: drop-in for Prover._prove (same transcript + rng schedule)
# ---------------------------------------------------------------------------

class _PtsCache:
    """Content-keyed cache of converted point-table device arrays.

    Keyed on a blake2b digest of the FULL coordinate content (shared with
    ops/jax_backend.content_digest) so the cache is safe even if a call
    site ever passes proof-supplied points (ADVICE.md round 2, low:
    sampled-content keys were one refactor away from an aliasing hazard)."""

    def __init__(self, max_entries=8):
        self.entries = {}
        self.max = max_entries

    def get(self, points, ctx):
        """Returns (device_array, is_affine): affine tables qualify for the
        mixed-add bucket kernel (ops/ec_pallas)."""
        from .jax_backend import content_digest
        key = content_digest(points, ctx)
        hit = self.entries.get(key)
        if hit is None:
            if len(self.entries) >= self.max:
                self.entries.clear()
            hit = self.entries[key] = ej.to_device_points_affine(points, ctx)
        return hit


_pts_cache = _PtsCache()


def _plain_scalars(vals, fr):
    """Host Scalars/ints -> (Lr, n) plain-form limb array."""
    return jnp.asarray(fj.ints_to_limbs(
        [v.v if hasattr(v, "v") else int(v) for v in vals], fr.L))


def device_prove_available(n_hint):
    """Gate for the device prover/verifier path.

    - explicit jax backend: on for n >= BP_PROVER_DEVICE_MIN
    - auto: on when REAL accelerator hardware is present and the circuit is
      big enough that the device path beats the native host path.  The
      crossover moved UP in round 3: the IFMA/GLV native layer proves
      config #2 (n=2048) in ~0.98 s vs ~2.1 s on the v5e device path (the
      ~30 ms/dispatch tunnel latency x 2 calls x log2(n) IPA rounds is a
      protocol-inherent floor the native path does not pay), so auto now
      defers to the device only at BP_PROVER_DEVICE_AUTO_MIN (default
      16384, where per-round MSM compute dominates latency)."""
    from .. import backend as backend_mod
    if n_hint < DEVICE_PROVER_MIN_N:
        return False
    be = backend_mod.get_backend(2 * n_hint + 1)
    if getattr(be, "name", "") == "jax":
        return True
    if backend_mod._mode == "auto" and n_hint >= DEVICE_PROVER_AUTO_MIN:
        if backend_mod._lazy_jax() is None:
            return False
        import jax
        return jax.default_backend() not in ("cpu",)
    return False


@partial(jax.jit, static_argnums=(2,))
def _masked_sums_jit(points, masks, ctx):
    """points (3, L, n) Montgomery, masks (S, n) in {0,1} -> (3, L, S):
    per-mask sums of the selected points via a log2(n) tree of complete
    adds.  ~n total adds, no sorts, no bucket grid — the fast path for
    BIT-STRUCTURED witness vectors (range-proof a_L/a_O in {0,1}, a_R in
    {0,-1}), whose Pippenger digits all collide in bucket 1 and forced 6
    pre-reduction passes over (S*W, n) tables (round-3 prove profile:
    phase-1 was half the warm prove)."""
    S = masks.shape[0]
    n = points.shape[2]
    ident = ctx.identity.reshape(1, 3, -1, 1)
    sel = jnp.where(masks[:, None, None, :] != 0, points[None], ident)
    sel = jnp.transpose(sel, (1, 2, 0, 3))          # (3, L, S, n)
    m = 1 << (n - 1).bit_length()
    if m != n:
        pad = jnp.broadcast_to(ctx.identity.reshape(3, -1, 1, 1),
                               (3, points.shape[1], S, m - n))
        sel = jnp.concatenate([sel, pad], axis=3)
    while m > 1:
        half = m // 2
        sel = ej.ec_add(sel[..., :half], sel[..., half:], ctx)
        m = half
    return sel[..., 0]                              # (3, L, S)


def _bit_structure(vals, r):
    """Classify a host scalar vector: 'bits' (all in {0,1}), 'negbits'
    (all in {0, r-1}), or None (general)."""
    bits = negbits = True
    for v in vals:
        x = v.v if hasattr(v, "v") else int(v)
        if x not in (0, 1):
            bits = False
        if x != 0 and x != r - 1:
            negbits = False
        if not bits and not negbits:
            return None
    return "bits" if bits else "negbits"


def _phase_commitments(aL, aR, aO, blinds, s_L, s_R, pts, h, ctx, fr,
                       affine=False):
    """A_I / A_O / S commitments for one phase (`prover.rs:336-366`).
    pts: (3, L, 2n+1) device table [G_n | H_n | h].

    Structured-witness fast path: when a_L/a_O are bit vectors and a_R is
    a {0,-1} vector (every bit-decomposition gadget), A_I and A_O are
    masked tree-sums (`_masked_sums_jit`, one device call) and only the
    RANDOM S set runs the Pippenger — no pre-reduction passes, no
    per-window tables.  General witness values fall back to the 3-set
    hybrid MSM.  Same group elements (and transcript bytes) either way."""
    import numpy as np
    n = len(aL)
    i_blind, o_blind, s_blind = blinds
    r = ctx.cv.r
    sL_cls = _bit_structure(aL, r)
    sR_cls = _bit_structure(aR, r)
    sO_cls = _bit_structure(aO, r)
    structured = (sL_cls == "bits" and sO_cls == "bits"
                  and sR_cls in ("bits", "negbits"))
    if not structured:
        zero_n = [Scalar.zero()] * n
        sets = jnp.stack([
            _plain_scalars(aL + aR + [i_blind], fr),
            _plain_scalars(aO + zero_n + [o_blind], fr),
            _plain_scalars(s_L + s_R + [s_blind], fr)], axis=0)
        return msm_mod.msm_hybrid(pts, sets, ctx, affine=affine)

    def bitmask(vals):
        return [1 if (v.v if hasattr(v, "v") else int(v)) else 0
                for v in vals]

    zeros = [0] * n
    masks = np.asarray([
        bitmask(aL) + zeros + [0],          # A_I G-half
        zeros + bitmask(aR) + [0],          # A_I H-half (negate if -1s)
        bitmask(aO) + zeros + [0],          # A_O G-half
    ], dtype=np.uint8)
    sums = ej.from_device_points(_masked_sums_jit(pts, masks, ctx), ctx)
    g_sum, h_sum, o_sum = sums
    if sR_cls == "negbits":
        h_sum = -h_sum
    from .cpp_backend import CppBackend
    bh, bo = CppBackend().scalar_mul_batch([h, h], [i_blind, o_blind])
    A_I = g_sum + h_sum + bh
    A_O = o_sum + bo
    (S,) = msm_mod.msm_hybrid(
        pts, _plain_scalars(s_L + s_R + [s_blind], fr)[None], ctx,
        affine=affine)
    return A_I, A_O, S


def prove_device(prover, G, H):
    """Device-path `Prover.prove` (`prover.rs:322-593`): bit-identical
    transcript/blinding schedule to `r1cs/prover.py:_prove`, with every O(n)
    step on the TPU.  Host touches: transcript, rng draws, the 5 T_i
    Pedersen commitments, and the per-round (L, R) transcript sync."""
    from ..utils.errors import InvalidGeneratorsLength
    from ..utils.vector_poly import Poly6
    from ..ops.field_host import random_scalars, inner_product
    from ..ops.ec_host import commit_to_field_element
    from ..r1cs.proof import R1CSProof

    tr = prover.transcript
    rng = prover.rng
    cv = prover.g.cv
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr

    tr.append_u64(b"m", len(prover.v))

    n1 = len(prover.a_L)
    if len(G) < n1:
        raise InvalidGeneratorsLength()

    i_blinding1 = Scalar.random(rng)
    o_blinding1 = Scalar.random(rng)
    s_blinding1 = Scalar.random(rng)
    s_L1 = random_scalars(n1, rng)
    s_R1 = random_scalars(n1, rng)

    # A_I1 / A_O1 / S1 over [G_n1 | H_n1 | h] (`prover.rs:336-366`):
    # structured-witness masked sums + one random-set MSM, or the 3-set
    # hybrid MSM for general witnesses (_phase_commitments).
    with _timed("phase1_convert"):
        Gd1, affG1 = _pts_cache.get(G[:n1], ctx)
        Hd1, affH1 = _pts_cache.get(H[:n1], ctx)
        hd, affh = ej.to_device_points_affine([prover.h], ctx)
        pts1 = jnp.concatenate([Gd1, Hd1, hd], axis=2)
    with _timed("phase1_msm"):
        A_I1, A_O1, S1 = _phase_commitments(
            prover.a_L, prover.a_R, prover.a_O,
            (i_blinding1, o_blinding1, s_blinding1),
            s_L1, s_R1, pts1, prover.h, ctx, fr,
            affine=affG1 and affH1 and affh)

    tr.commit_point(b"A_I1", A_I1)
    tr.commit_point(b"A_O1", A_O1)
    tr.commit_point(b"S1", S1)

    prover._create_randomized_constraints()

    n = len(prover.a_L)
    n2 = n - n1
    padded_n = 1 if n == 0 else 1 << (n - 1).bit_length()
    pad = padded_n - n
    if len(G) < padded_n:
        raise InvalidGeneratorsLength()

    has_phase2 = n2 > 0
    if has_phase2:
        i_blinding2 = Scalar.random(rng)
        o_blinding2 = Scalar.random(rng)
        s_blinding2 = Scalar.random(rng)
    else:
        i_blinding2 = o_blinding2 = s_blinding2 = Scalar.zero()
    s_L2 = random_scalars(n2, rng)
    s_R2 = random_scalars(n2, rng)

    if has_phase2:
        Gd2, affG2 = _pts_cache.get(G[n1:n], ctx)
        Hd2, affH2 = _pts_cache.get(H[n1:n], ctx)
        hd2, affh2 = ej.to_device_points_affine([prover.h], ctx)
        pts2 = jnp.concatenate([Gd2, Hd2, hd2], axis=2)
        A_I2, A_O2, S2 = _phase_commitments(
            prover.a_L[n1:], prover.a_R[n1:], prover.a_O[n1:],
            (i_blinding2, o_blinding2, s_blinding2),
            s_L2, s_R2, pts2, prover.h, ctx, fr,
            affine=affG2 and affH2 and affh2)
    else:
        ident = type(prover.g).identity(cv)
        A_I2 = A_O2 = S2 = ident

    tr.commit_point(b"A_I2", A_I2)
    tr.commit_point(b"A_O2", A_O2)
    tr.commit_point(b"S2", S2)

    y = tr.challenge_scalar(b"y")
    z = tr.challenge_scalar(b"z")

    # device z-fold (prover.rs:142-184)
    with _timed("zfold"):
        q = len(prover.constraints)
        tables = build_zfold_tables(prover.constraints, n, len(prover.v))
        wL, wR, wO, wV_m = zfold_device(tables, z, q, fr, padded_n)

    # device l/r/t vector polys (prover.rs:458-488)
    with _timed("tpoly"):
        # one stacked host->mont conversion (one dispatch instead of six)
        zpad = [Scalar.zero()] * pad
        stacked = fr.to_mont(
            [v.v for v in (prover.a_L + zpad + prover.a_R + zpad
                           + prover.a_O + zpad + s_L1 + s_L2 + zpad
                           + s_R1 + s_R2 + zpad + [y])])
        N5 = padded_n
        aL_m = stacked[:, 0 * N5:1 * N5]
        aR_m = stacked[:, 1 * N5:2 * N5]
        aO_m = stacked[:, 2 * N5:3 * N5]
        sL_m = stacked[:, 3 * N5:4 * N5]
        sR_m = stacked[:, 4 * N5:5 * N5]
        y_m = stacked[:, 5 * N5:5 * N5 + 1]
        t16, l1, l2, l3, r0, r1, r3, y_inv_pows = _t_poly_kernel(
            aL_m, aR_m, aO_m, sL_m, sR_m, wL, wR, wO, y_m, fr)
        t_ints = fr.from_mont(t16)
    t1s, t2s, t3s, t4s, t5s, t6s = [Scalar(v) for v in t_ints]
    t_poly = Poly6(t1s, t2s, t3s, t4s, t5s, t6s)

    t_1_blinding = Scalar.random(rng)
    t_3_blinding = Scalar.random(rng)
    t_4_blinding = Scalar.random(rng)
    t_5_blinding = Scalar.random(rng)
    t_6_blinding = Scalar.random(rng)

    g_, h_ = prover.g, prover.h
    # 5 Pedersen commits g^t h^r in ONE native batched fold (the Python
    # double-and-add ladders cost ~80 ms here; the x8 IFMA fold ~3 ms)
    from .cpp_backend import CppBackend
    T_1, T_3, T_4, T_5, T_6 = CppBackend().fold_points(
        [g_] * 5, [h_] * 5, [t1s, t3s, t4s, t5s, t6s],
        [t_1_blinding, t_3_blinding, t_4_blinding, t_5_blinding,
         t_6_blinding])

    tr.commit_point(b"T_1", T_1)
    tr.commit_point(b"T_3", T_3)
    tr.commit_point(b"T_4", T_4)
    tr.commit_point(b"T_5", T_5)
    tr.commit_point(b"T_6", T_6)

    u = tr.challenge_scalar(b"u")
    x = tr.challenge_scalar(b"x")

    wV = [Scalar(v) for v in fr.from_mont(wV_m)]
    t_2_blinding = inner_product(wV, prover.v_blinding)
    t_blinding_poly = Poly6(t_1_blinding, t_2_blinding, t_3_blinding,
                            t_4_blinding, t_5_blinding, t_6_blinding)

    t_x = t_poly.eval(x)
    t_x_blinding = t_blinding_poly.eval(x)

    x_m = _mont(fr, [x])
    l_vec, r_vec = _lr_eval_kernel(l1, l2, l3, r0, r1, r3, x_m, fr)

    i_blinding = i_blinding1 + u * i_blinding2
    o_blinding = o_blinding1 + u * o_blinding2
    s_blinding = s_blinding1 + u * s_blinding2
    e_blinding = x * (i_blinding + x * (o_blinding + x * s_blinding))

    tr.commit_scalar(b"t_x", t_x)
    tr.commit_scalar(b"t_x_blinding", t_x_blinding)
    tr.commit_scalar(b"e_blinding", e_blinding)

    w = tr.challenge_scalar(b"w")
    Q = prover.g * w

    # G_factors = [1]*n1 + [u]*(n2+pad); H_factors = y^-i * G_factors
    u_m = _mont(fr, [u])
    one_col = jnp.broadcast_to(jnp.asarray(fr.one_m), (fr.L, n1))
    u_cols = jnp.broadcast_to(u_m, (fr.L, n2 + pad))
    Gf_m = jnp.concatenate([one_col, u_cols], axis=-1)
    Hf_m = fj.mont_mul(y_inv_pows, Gf_m, fr)

    Gdi, affGi = _pts_cache.get(G[:padded_n], ctx)
    Hdi, affHi = _pts_cache.get(H[:padded_n], ctx)
    Qdi, affQi = ej.to_device_points_affine([Q], ctx)
    # identity column: zero scalars, never scheduled (safe under mixed-add)
    pts_ipa = jnp.concatenate(
        [Gdi, Hdi, Qdi, jnp.asarray(ctx.identity)], axis=2)

    L_vec, R_vec, a_fin, b_fin = create_ipp_implicit(
        tr, Gf_m, Hf_m, pts_ipa, l_vec, r_vec, ctx,
        affine=affGi and affHi and affQi)
    from .. import ipp as ipp_mod
    ipp_proof = ipp_mod.InnerProductArgumentProof(
        L=L_vec, R=R_vec, a=a_fin, b=b_fin)
    if _PROFILE:
        _prof.dump(f"prove_device n={padded_n}")

    return R1CSProof(A_I1=A_I1, A_O1=A_O1, S1=S1, A_I2=A_I2, A_O2=A_O2,
                     S2=S2, T_1=T_1, T_3=T_3, T_4=T_4, T_5=T_5, T_6=T_6,
                     t_x=t_x, t_x_blinding=t_x_blinding,
                     e_blinding=e_blinding, ipp_proof=ipp_proof)
