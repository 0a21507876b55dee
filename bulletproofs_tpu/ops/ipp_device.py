"""Device-resident inner-product argument (prover side).

The north-star decomposition of `/root/reference/src/ipp.rs`'s serial loop
(SURVEY.md section 2.3): every O(n) object — the a/b scalar vectors, the G/H
basis vectors, the per-round folds and the L/R MSMs — lives on the TPU for
the whole argument; the only device<->host traffic per round is the (L, R)
pair the Fiat-Shamir transcript must hash (inherent to the protocol) and the
challenge coming back.

Scalar vectors are kept in MONTGOMERY form in F_r so folds and inner
products are mont_mul/add chains; they are converted to plain form only at
the MSM digit decomposition.
"""

import jax.numpy as jnp

from ..config import curve
from . import ec_jax as ej
from . import field_jax as fj
from . import msm as msm_mod
from .field_host import Scalar


def _scalars_to_mont(scalars, fr):
    vals = [s.v if hasattr(s, "v") else int(s) for s in scalars]
    return fr.to_mont(vals)


def _mont_to_plain(a, fr):
    one = jnp.zeros_like(a).at[0].set(1)
    return fj.mont_mul(a, one, fr)


def _inner_product_mont(a, b, fr):
    """<a, b> over F_r, Montgomery in/out: elementwise mont_mul then a
    halving reduction tree of add_mod (log n levels, shrinking shapes)."""
    prod = fj.mont_mul(a, b, fr)
    n = prod.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        left = prod[..., :half]
        right = prod[..., half:n]
        if right.shape[-1] < half:
            pad = half - right.shape[-1]
            right = jnp.concatenate(
                [right, jnp.zeros(right.shape[:-1] + (pad,), right.dtype)],
                axis=-1)
        prod = fj.add_mod(left, right, fr)
        n = half
    return prod                                     # (Lr, 1)


def _msm(points_dev, scalars_mont, ctx):
    """Device MSM (guess-verify round count); scalars arrive in mont form."""
    plain = _mont_to_plain(scalars_mont, ctx.fr)
    c = msm_mod.pick_window(points_dev.shape[2])
    out = msm_mod.msm_device(points_dev, plain, ctx, c)
    return ej.from_device_points(out, ctx)[0]


def create_ipp_device(transcript, Q, G_factors, H_factors, G_vec, H_vec,
                      a_vec, b_vec):
    """Drop-in device path for `ipp.create_ipp` (same transcript schedule as
    `ipp.rs:35-202`); returns (L_vec, R_vec, a, b) host-side."""
    cv = curve()
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr
    n = len(G_vec)

    G = ej.to_device_points(list(G_vec), ctx)
    H = ej.to_device_points(list(H_vec), ctx)
    a = _scalars_to_mont(a_vec, fr)
    b = _scalars_to_mont(b_vec, fr)
    Gf = _scalars_to_mont(G_factors, fr)
    Hf = _scalars_to_mont(H_factors, fr)
    Qd = ej.to_device_points([Q], ctx)

    transcript.innerproduct_domain_sep(n)

    L_vec, R_vec = [], []
    first_round = True
    while n != 1:
        n //= 2
        a_L, a_R = a[..., :n], a[..., n:]
        b_L, b_R = b[..., :n], b[..., n:]
        G_L, G_R = G[..., :n], G[..., n:]
        H_L, H_R = H[..., :n], H[..., n:]

        c_L = _inner_product_mont(a_L, b_R, fr)
        c_R = _inner_product_mont(a_R, b_L, fr)

        if first_round:
            Gf_L, Gf_R = Gf[..., :n], Gf[..., n:]
            Hf_L, Hf_R = Hf[..., :n], Hf[..., n:]
            L_scal = jnp.concatenate(
                [fj.mont_mul(a_L, Gf_R, fr), fj.mont_mul(b_R, Hf_L, fr),
                 c_L], axis=-1)
            R_scal = jnp.concatenate(
                [fj.mont_mul(a_R, Gf_L, fr), fj.mont_mul(b_L, Hf_R, fr),
                 c_R], axis=-1)
        else:
            L_scal = jnp.concatenate([a_L, b_R, c_L], axis=-1)
            R_scal = jnp.concatenate([a_R, b_L, c_R], axis=-1)

        L_pts = jnp.concatenate([G_R, H_L, Qd], axis=-1)
        R_pts = jnp.concatenate([G_L, H_R, Qd], axis=-1)
        L = _msm(L_pts, L_scal, ctx)
        R = _msm(R_pts, R_scal, ctx)

        transcript.commit_point(b"L", L)
        transcript.commit_point(b"R", R)
        L_vec.append(L)
        R_vec.append(R)

        u = transcript.challenge_scalar(b"u")
        u_inv = u.inverse()
        u_m = fr.to_mont([u.v])                      # (Lr, 1) broadcast
        u_inv_m = fr.to_mont([u_inv.v])

        a = fj.add_mod(fj.mont_mul(a_L, u_m, fr),
                       fj.mont_mul(a_R, u_inv_m, fr), fr)
        b = fj.add_mod(fj.mont_mul(b_L, u_inv_m, fr),
                       fj.mont_mul(b_R, u_m, fr), fr)

        if first_round:
            s1 = fj.mont_mul(Gf_L, u_inv_m, fr)
            s2 = fj.mont_mul(Gf_R, u_m, fr)
            t1 = fj.mont_mul(Hf_L, u_m, fr)
            t2 = fj.mont_mul(Hf_R, u_inv_m, fr)
            first_round = False
        else:
            ones = jnp.broadcast_to(fr.one_m, (fr.L, n))
            s1 = fj.mont_mul(ones, u_inv_m, fr)
            s2 = fj.mont_mul(ones, u_m, fr)
            t1, t2 = s2, s1
        G = ej.ec_pair_fold(G_L, G_R, _mont_to_plain(s1, fr),
                            _mont_to_plain(s2, fr), ctx)
        H = ej.ec_pair_fold(H_L, H_R, _mont_to_plain(t1, fr),
                            _mont_to_plain(t2, fr), ctx)

    a_final = Scalar(fr.from_mont(a)[0])
    b_final = Scalar(fr.from_mont(b)[0])
    return L_vec, R_vec, a_final, b_final
