"""Device (JAX/TPU) G1 group ops: batched complete projective arithmetic.

TPU-native replacement for `amcl_wrapper::group_elem_g1::{G1, G1Vector}`
(SURVEY.md section 2.1): the serial per-element loops of the reference —
`binary_scalar_mul` IPA folds (`/root/reference/src/ipp.rs:115-130`), MSM
inner loops — become batched kernels over point arrays here.

Layout: a batch of points is ONE uint32 array of shape (3, L, *batch) —
projective (X:Y:Z) coordinates in Montgomery form, 16-bit limbs on axis 1,
batch trailing (TPU lanes).  Identity is (0 : 1 : 0).

Group law: the branch-free COMPLETE projective addition of Renes-Costello-
Batina 2016 (algorithm 7, a=0 specialization) — the same formulas as the host
backend (`ops/ec_host.py`), so host and device cross-check exactly.
Completeness matters on TPU: one formula for add/double/identity means no
data-dependent branches anywhere, every op is a dense vector op.
"""



import numpy as np

import jax
import jax.numpy as jnp

from ..config import LIMB_BITS, CurveParams
from . import field_jax as fj
from .field_jax import FieldCtx, add_mod, mont_mul, mul_small, neg_mod, sub_mod


class CurveCtx:
    """Device constants for one curve's G1 (cached singleton per curve)."""

    _cache = {}

    def __new__(cls, cv: CurveParams):
        if cv.name in cls._cache:
            return cls._cache[cv.name]
        self = super().__new__(cls)
        cls._cache[cv.name] = self
        self.cv = cv
        self.fp = FieldCtx(cv.fp)
        self.fr = FieldCtx(cv.fr)
        self.b3 = 3 * cv.b
        self.a_is_zero = cv.a == 0
        L = self.fp.L
        # identity (0 : 1 : 0) in Montgomery form, shape (3, L, 1)
        # (numpy so it traces as a literal — see FieldCtx)
        self.identity = np.stack([
            self.fp.zero, self.fp.one_m, self.fp.zero], axis=0)
        if not self.a_is_zero:
            # general-a constants for RCB16 algorithm 1: the (L, 6, 1)
            # Montgomery stack [a, a, a^2, a, 3b, 3b] multiplied against
            # [xz, t2, t2, t0, t2, xz] in one 6-wide kernel (ed25519's
            # Weierstrass a and b are full-width field elements, unlike the
            # tiny b of the a = 0 curves)
            p = cv.p
            mont = lambda v: (v % p) * cv.fp.mont_r % p
            a_m, a2_m, b3_m = mont(cv.a), mont(cv.a * cv.a), mont(3 * cv.b)
            self.gen_consts = fj.ints_to_limbs(
                [a_m, a_m, a2_m, a_m, b3_m, b3_m], L).reshape(L, 6, 1)
        return self

    def identity_like(self, shape):
        """(3, L, *shape) batch of identities."""
        return jnp.broadcast_to(
            self.identity.reshape((3, self.fp.L) + (1,) * len(shape)),
            (3, self.fp.L) + tuple(shape))


# ---------------------------------------------------------------------------
# Group law
# ---------------------------------------------------------------------------

def ec_add(P, Q, ctx: CurveCtx):
    """Complete projective addition (RCB16), batched.

    Independent field multiplies are STACKED on an inner batch axis so the
    whole add is two (a=0: algorithm 7) or three (general a: algorithm 1)
    6-wide Montgomery multiplies plus cheap add/sub chains — fewer sequential
    limb scans and wider vector lanes than issuing the multiplies separately.
    """
    f = ctx.fp
    b3 = ctx.b3
    X1, Y1, Z1 = P[0], P[1], P[2]
    X2, Y2, Z2 = Q[0], Q[1], Q[2]

    # sums (X1+Y1, Y1+Z1, X1+Z1) and the Q-side, one stacked add each
    s1 = add_mod(jnp.stack([X1, Y1, X1], axis=1),
                 jnp.stack([Y1, Z1, Z1], axis=1), f)
    s2 = add_mod(jnp.stack([X2, Y2, X2], axis=1),
                 jnp.stack([Y2, Z2, Z2], axis=1), f)

    # stage 1: t0=X1X2, t1=Y1Y2, t2=Z1Z2, pxy, pyz, pxz
    lhs = jnp.concatenate([jnp.stack([X1, Y1, Z1], axis=1), s1], axis=1)
    rhs = jnp.concatenate([jnp.stack([X2, Y2, Z2], axis=1), s2], axis=1)
    t = mont_mul(lhs, rhs, f)
    t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]
    # xy = X1Y2+X2Y1, yz = Y1Z2+Y2Z1, xz = X1Z2+X2Z1 (two stacked subs)
    d = sub_mod(sub_mod(t[:, 3:6],
                        jnp.stack([t0, t1, t0], axis=1), f),
                jnp.stack([t1, t2, t2], axis=1), f)
    xy, yz, xz = d[:, 0], d[:, 1], d[:, 2]

    if not ctx.a_is_zero:
        return _ec_add_general_tail(t0, t1, t2, xy, yz, xz, ctx)

    b3_t2 = mul_small(t2, b3, f)
    m = sub_mod(t1, b3_t2, f)              # Y1Y2 - 3b Z1Z2
    n = add_mod(t1, b3_t2, f)              # Y1Y2 + 3b Z1Z2

    # stage 2: xy*m, yz*xz, n*m, t0*xz, yz*n, t0*xy — one stacked multiply
    u = mont_mul(jnp.stack([xy, yz, n, t0, yz, t0], axis=1),
                 jnp.stack([m, xz, m, xz, n, xy], axis=1), f)
    # b3*(yz*xz) and b3*(t0*xz), stacked
    w = mul_small(jnp.stack([u[:, 1], u[:, 3]], axis=1), b3, f)
    # 3*(b3*t0*xz) and 3*(t0*xy), stacked
    v = mul_small(jnp.stack([w[:, 1], u[:, 5]], axis=1), 3, f)

    X3 = sub_mod(u[:, 0], w[:, 0], f)                  # xy*m - b3*yz*xz
    Y3 = add_mod(u[:, 2], v[:, 0], f)                  # n*m + 3b3*t0*xz
    Z3 = add_mod(u[:, 4], v[:, 1], f)                  # yz*n + 3*t0*xy
    return jnp.stack([X3, Y3, Z3], axis=0)


def _ec_add_general_tail(t0, t1, t2, xy, yz, xz, ctx: CurveCtx):
    """RCB16 algorithm 1 tail (general a — ed25519's Weierstrass form; the
    host backend's a != 0 branch in `ops/ec_host.py` is the scalar mirror).
    One 6-wide constant multiply ([a,a,a^2,a,3b,3b] stack) + one 6-wide
    variable multiply."""
    f = ctx.fp
    consts = ctx.gen_consts.reshape(
        (f.L, 6) + (1,) * (xz.ndim - 1))           # align trailing batch dims
    v = mont_mul(jnp.stack([xz, t2, t2, t0, t2, xz], axis=1), consts, f)
    # v = [a*xz, a*t2, a^2*t2, a*t0, b3*t2, b3*xz]
    w = add_mod(v[:, 0], v[:, 4], f)                   # a*xz + b3*t2
    m = sub_mod(t1, w, f)
    n = add_mod(t1, w, f)
    u1 = add_mod(mul_small(t0, 3, f), v[:, 1], f)      # 3*t0 + a*t2
    u4 = add_mod(v[:, 5], sub_mod(v[:, 3], v[:, 2], f), f)
    u = mont_mul(jnp.stack([xy, yz, m, u1, yz, xy], axis=1),
                 jnp.stack([m, u4, n, u4, n, u1], axis=1), f)
    X3 = sub_mod(u[:, 0], u[:, 1], f)                  # xy*m - yz*u4
    Y3 = add_mod(u[:, 2], u[:, 3], f)                  # m*n + u1*u4
    Z3 = add_mod(u[:, 4], u[:, 5], f)                  # yz*n + xy*u1
    return jnp.stack([X3, Y3, Z3], axis=0)


def ec_double(P, ctx: CurveCtx):
    return ec_add(P, P, ctx)


def ec_neg(P, ctx: CurveCtx):
    return jnp.stack([P[0], neg_mod(P[1], ctx.fp), P[2]], axis=0)


def ec_select(mask, P, Q):
    """where(mask, P, Q) for a (batch,)-shaped bool mask."""
    return jnp.where(mask[None, None], P, Q)


def ec_is_identity(P):
    """(batch,) bool: Z == 0."""
    return fj.is_zero(P[2])


# ---------------------------------------------------------------------------
# Scalar multiplication / folds
# ---------------------------------------------------------------------------

def _bit_at(scalars, bit_idx):
    """Bit `bit_idx` (traced int) of plain-form scalar limbs (Lr, *batch)."""
    j = bit_idx // LIMB_BITS
    sh = bit_idx % LIMB_BITS
    limb = jax.lax.dynamic_index_in_dim(scalars, j, axis=0, keepdims=False)
    return (limb >> sh) & 1


def ec_scalar_mul(P, scalars, ctx: CurveCtx):
    """[k_i * P_i] batched double-and-add ladder, MSB-first over the full
    scalar-field bit width.  scalars: (Lr, *batch) plain-form limbs."""
    n_bits = ctx.cv.fr.n_bits
    acc0 = ctx.identity_like(P.shape[2:])

    def body(i, acc):
        bit_idx = n_bits - 1 - i
        acc = ec_double(acc, ctx)
        added = ec_add(acc, P, ctx)
        return ec_select(_bit_at(scalars, bit_idx) == 1, added, acc)

    return jax.lax.fori_loop(0, n_bits, body, acc0)


def ec_pair_fold(PL, PR, s1, s2, ctx: CurveCtx):
    """[s1_i*PL_i + s2_i*PR_i] — the batched IPA basis fold, replacing the
    reference's per-element `binary_scalar_mul` loop (`ipp.rs:115-130`).

    Straus/Shamir simultaneous ladder: one shared doubling chain, per-bit
    select from the 4-entry table {O, PL, PR, PL+PR} (complete addition makes
    the sel==0 identity-add branch-free).
    """
    n_bits = ctx.cv.fr.n_bits
    T3 = ec_add(PL, PR, ctx)
    O = ctx.identity_like(PL.shape[2:])
    acc0 = O

    def body(i, acc):
        bit_idx = n_bits - 1 - i
        b1 = _bit_at(s1, bit_idx)
        b2 = _bit_at(s2, bit_idx)
        acc = ec_double(acc, ctx)
        delta = ec_select(b2 == 1,
                          ec_select(b1 == 1, T3, PR),
                          ec_select(b1 == 1, PL, O))
        return ec_add(acc, delta, ctx)

    return jax.lax.fori_loop(0, n_bits, body, acc0)


# ---------------------------------------------------------------------------
# Normalization / host interop
# ---------------------------------------------------------------------------

def ec_normalize(P, ctx: CurveCtx):
    """Projective -> affine (x, y) Montgomery limbs via batched Fermat
    inversion; identity maps to the amcl convention (0, 1)
    (`ops/ec_host.py` `affine`)."""
    f = ctx.fp
    is_id = ec_is_identity(P)
    # avoid 0-inverse: substitute Z=1 for identities
    z = jnp.where(is_id[None], jnp.broadcast_to(
        f.one_m.reshape((f.L,) + (1,) * (P.ndim - 2)), P[2].shape), P[2])
    zinv = fj.inv_mont(z, f)
    x = mont_mul(P[0], zinv, f)
    y = mont_mul(P[1], zinv, f)
    x = jnp.where(is_id[None], 0, x)
    y = jnp.where(is_id[None], jnp.broadcast_to(
        f.one_m.reshape((f.L,) + (1,) * (P.ndim - 2)), y.shape), y)
    return x, y


def to_device_points(points, ctx: CurveCtx):
    """list[ec_host.G1] -> (3, L, n) Montgomery device array."""
    coords = []
    for pt in points:
        coords.extend((pt.X, pt.Y, pt.Z))
    m = ctx.fp.to_mont(coords)              # (L, 3n)
    return jnp.transpose(m.reshape(ctx.fp.L, len(points), 3),
                         (2, 0, 1))


def to_device_points_affine(points, ctx: CurveCtx):
    """list[ec_host.G1] -> ((3, L, n) Montgomery device array, is_affine).

    Host-normalizes any projective (Z != 1) points with one batched
    inversion so every table row has Z == 1 — the precondition for the
    mixed-add bucket kernel (ops/ec_pallas.bucket_rounds_chunk_pallas_mixed,
    RCB16 algorithm 8).  If the list contains the identity (which has no
    affine encoding) is_affine is False and the array is the plain
    projective conversion — callers fall back to the general kernel."""
    if any(pt.Z == 0 for pt in points):
        return to_device_points(points, ctx), False
    if all(pt.Z == 1 for pt in points):
        return to_device_points(points, ctx), True
    p = ctx.cv.p
    proj = [pt for pt in points if pt.Z != 1]
    # batched inversion over F_p (Montgomery trick, host ints)
    n = len(proj)
    prefix = [1] * (n + 1)
    for i, pt in enumerate(proj):
        prefix[i + 1] = prefix[i] * pt.Z % p
    acc = pow(prefix[n], -1, p)
    zinv = [0] * n
    for i in range(n - 1, -1, -1):
        zinv[i] = prefix[i] * acc % p
        acc = acc * proj[i].Z % p
    from .ec_host import G1
    norm = []
    j = 0
    for pt in points:
        if pt.Z == 1:
            norm.append(pt)
        else:
            zi = zinv[j]
            j += 1
            norm.append(G1(pt.X * zi % p, pt.Y * zi % p, 1, pt.cv))
    return to_device_points(norm, ctx), True


def from_device_points(P, ctx: CurveCtx):
    """(3, L, n) device array -> list[ec_host.G1] (projective, unreduced)."""
    from .ec_host import G1
    L, n = P.shape[1], P.shape[2]
    flat = jnp.transpose(P, (1, 0, 2)).reshape(L, 3 * n)   # (L, 3n)
    ints = fj.limbs_to_ints(fj._from_mont_jit(flat, ctx.fp))
    out = []
    for i in range(n):
        X, Y, Z = ints[i], ints[n + i], ints[2 * n + i]
        out.append(G1(X, Y, Z, ctx.cv))
    return out


def to_device_scalars(scalars, ctx: CurveCtx):
    """list[Scalar|int] -> (Lr, n) plain-form limb array."""
    vals = [s.v if hasattr(s, "v") else int(s) % ctx.cv.r for s in scalars]
    return jnp.asarray(fj.ints_to_limbs(vals, ctx.fr.L))
