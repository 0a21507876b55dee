"""Device-resident R1CS verifier (`/root/reference/src/r1cs/verifier.rs`).

The verifier's cost is one mega-MSM plus O(n) scalar assembly
(`verifier.rs:267-457`).  Here every O(n) step runs on the TPU:

- the z-fold with the wc constant term (`verifier.rs:149-193`) through the
  same gather + tree-sum kernel as the prover (ops/prover_device.py),
- the IPA verification s-vector (`ipp.rs:262-315`) built with log2(n)
  doubling passes (s[2^k..2^(k+1)) = s[0..2^k) * u_{lg-1-k}^2 — the
  inductive definition IS a doubling recurrence),
- delta and the g/h scalar assembly (`verifier.rs:350-390`) as elementwise
  Montgomery kernels,
- the mega-MSM through the hybrid Pippenger (ops/msm.py msm_hybrid).

The transcript replay and the handful of head scalars stay on the host
(inherently serial, tiny).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from . import ec_jax as ej
from . import field_jax as fj
from . import msm as msm_mod
from .field_host import Scalar
from . import prover_device
from .prover_device import (_inner_mont, _mont, _pts_cache,
                            build_zfold_tables, zfold_device, _pow_shifted)

import os as _os

# Verification is ONE mega-MSM + cheap scalar assembly: below this size the
# native C++ path wins (measured v5e: n=2048 device verify 1.26s vs 0.51s
# native — per-dispatch tunnel latency dominates a single-MSM workload,
# unlike the prover's ~25 amortizing MSMs).
DEVICE_VERIFY_MIN_N = int(_os.environ.get("BP_VERIFIER_DEVICE_MIN", "8192"))


def device_verify_available(n_hint):
    from ..backend import get_backend
    if n_hint < DEVICE_VERIFY_MIN_N:
        return False
    be = get_backend(2 * n_hint + 1)
    return getattr(be, "name", "") == "jax"


def _affine_or_zero(points, vals, ctx, dummy):
    """Sanitize PROOF-SUPPLIED points for the mixed-add bucket kernel:
    identity points (no affine encoding, e.g. A_I2/A_O2/S2 of a 1-phase
    proof) are replaced by the affine `dummy` with scalar 0 — the MSM sum
    is unchanged (identity*s == dummy*0) and the table stays affine.
    Returns (device_pts, vals, is_affine)."""
    pts2, vals2 = [], []
    for p, v in zip(points, vals):
        if p.is_identity():
            pts2.append(dummy)
            vals2.append(0)
        else:
            pts2.append(p)
            vals2.append(v)
    dev, aff = ej.to_device_points_affine(pts2, ctx)
    return dev, vals2, aff


@partial(jax.jit, static_argnums=(2, 3))
def _s_vector_kernel(u_sq_stack, prod_inv_m, lg_n, fr):
    """u_sq_stack (Lr, lg_n) Montgomery u_j^2 (round order), prod_inv (Lr,1)
    -> s (Lr, n).  s[0] = prod(u^-1); s[i] = s[i - 2^lg i] * u_{lg_n-1-lg i}^2
    (`ipp.rs:297-310`) == doubling: s[2^k:2^(k+1)] = s[:2^k] * u_{lg-1-k}^2."""
    s = prod_inv_m
    for k in range(lg_n):
        u2 = u_sq_stack[:, lg_n - 1 - k:lg_n - k]
        s = jnp.concatenate([s, fj.mont_mul(s, u2, fr)], axis=-1)
    return s


@partial(jax.jit, static_argnums=(10, 11))
def _gh_scalars_kernel(wL, wR, wO, s, y_inv_pows, x_m, a_m, b_m, u_m,
                       n1_mask, pad_n, fr):
    """g_scalars = u_or_1 * (x * y^-i * wR_i - a * s_i)
    h_scalars = u_or_1 * (y^-i * (x * wL_i + wO_i - b * s_rev_i) - 1)
    (`verifier.rs:368-390`).  Also returns delta = <y^-i*wR, wL>
    (`verifier.rs:350-352`).  All (Lr, pad_n) Montgomery; n1_mask is the
    static 0/1 vector selecting the phase-1 positions (u_or_1 == 1)."""
    y_inv_wR = fj.mont_mul(y_inv_pows, wR, fr)
    delta = _inner_mont(y_inv_wR, wL, fr)

    one = jnp.broadcast_to(jnp.asarray(fr.one_m), (fr.L, pad_n))
    u_or_1 = jnp.where(jnp.asarray(n1_mask) == 1, one,
                       jnp.broadcast_to(u_m, (fr.L, pad_n)))

    g_inner = fj.sub_mod(fj.mont_mul(x_m, y_inv_wR, fr),
                         fj.mont_mul(a_m, s, fr), fr)
    g_scal = fj.mont_mul(u_or_1, g_inner, fr)

    s_rev = s[:, ::-1]
    h_inner = fj.sub_mod(
        fj.add_mod(fj.mont_mul(x_m, wL, fr), wO, fr),
        fj.mont_mul(b_m, s_rev, fr), fr)
    h_scal = fj.mont_mul(
        u_or_1, fj.sub_mod(fj.mont_mul(y_inv_pows, h_inner, fr), one, fr),
        fr)

    # -> plain form for the MSM digits
    both = jnp.concatenate([g_scal, h_scal], axis=-1)
    plain = fj.mont_mul(both, jnp.zeros_like(both).at[0].set(1), fr)
    return plain[:, :pad_n], plain[:, pad_n:], delta


def verify_ipp_device(n, transcript, G_factors, H_factors, P_pt, Q, G, H,
                      a, b, L_vec, R_vec):
    """Device path for the standalone IPA check (`ipp.rs:204-260`,
    BASELINE config #3): transcript replay on host, s-vector + scalar
    assembly on device, ONE hybrid mega-MSM of size 2n + 2 lg n + 1."""
    from ..config import curve
    from ..utils.errors import VerificationError
    from .field_host import batch_invert

    cv = curve()
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr

    lg_n = len(L_vec)
    if lg_n >= 32 or n != (1 << lg_n):
        raise VerificationError("inconsistent IPA proof size")
    transcript.innerproduct_domain_sep(n)
    challenges = []
    for L_pt, R_pt in zip(L_vec, R_vec):
        transcript.commit_point(b"L", L_pt)
        transcript.commit_point(b"R", R_pt)
        challenges.append(transcript.challenge_scalar(b"u"))
    challenges_inv, prod_inv = batch_invert(challenges)
    u_sq = [c2.square() for c2 in challenges]
    u_inv_sq = [c2.square() for c2 in challenges_inv]

    if lg_n:
        s_dev = _s_vector_kernel(_mont(fr, u_sq), _mont(fr, [prod_inv]),
                                 lg_n, fr)
    else:
        s_dev = _mont(fr, [prod_inv])

    Gf_m = _mont(fr, G_factors)
    Hf_m = _mont(fr, H_factors)
    g_plain, h_plain = _ipp_scalars_kernel(
        s_dev, Gf_m, Hf_m, _mont(fr, [a]), _mont(fr, [b]), fr)

    head = [a * b]
    tail = [-t for t in u_sq] + [-t for t in u_inv_sq]
    Gd, affG = _pts_cache.get(list(G), ctx)
    Hd, affH = _pts_cache.get(list(H), ctx)
    ht_dev, ht_vals, aff_ht = _affine_or_zero(
        [Q] + list(L_vec) + list(R_vec), [v.v for v in head + tail],
        ctx, G[0])
    head_plain = jnp.asarray(fj.ints_to_limbs(ht_vals, fr.L))
    scal = jnp.concatenate(
        [head_plain[:, :1], g_plain, h_plain, head_plain[:, 1:]],
        axis=-1)[None]
    pts = jnp.concatenate(
        [ht_dev[:, :, :1], Gd, Hd, ht_dev[:, :, 1:]], axis=2)
    expected = msm_mod.msm_hybrid(pts, scal, ctx,
                                  affine=affG and affH and aff_ht)[0]
    if expected != P_pt:
        raise VerificationError("IPA check failed")


@partial(jax.jit, static_argnums=(5,))
def _ipp_scalars_kernel(s, Gf_m, Hf_m, a_m, b_m, fr):
    """g_i = a * s_i * Gf_i;  h_i = b * s_rev_i * Hf_i  (plain form out)."""
    g_scal = fj.mont_mul(fj.mont_mul(a_m, s, fr), Gf_m, fr)
    h_scal = fj.mont_mul(fj.mont_mul(b_m, s[:, ::-1], fr), Hf_m, fr)
    both = jnp.concatenate([g_scal, h_scal], axis=-1)
    plain = fj.mont_mul(both, jnp.zeros_like(both).at[0].set(1), fr)
    n = g_scal.shape[-1]
    return plain[:, :n], plain[:, n:]


def verify_device(verifier, proof, g, h, G, H):
    """Device-path `Verifier.verify` (`verifier.rs:267-457`): identical
    transcript replay and a single mega-MSM == identity check, with the
    O(n) scalar assembly and the MSM on the TPU."""
    from ..config import curve
    from ..utils.errors import InvalidGeneratorsLength, VerificationError

    cv = curve()
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr
    tr = verifier.transcript

    tr.append_u64(b"m", len(verifier.V))

    n1 = verifier.num_vars
    tr.commit_point(b"A_I1", proof.A_I1)
    tr.commit_point(b"A_O1", proof.A_O1)
    tr.commit_point(b"S1", proof.S1)

    verifier._create_randomized_constraints()

    n = verifier.num_vars
    n2 = n - n1
    padded_n = 1 if n == 0 else 1 << (n - 1).bit_length()
    pad = padded_n - n
    if len(G) < padded_n:
        raise InvalidGeneratorsLength()

    tr.commit_point(b"A_I2", proof.A_I2)
    tr.commit_point(b"A_O2", proof.A_O2)
    tr.commit_point(b"S2", proof.S2)

    y = tr.challenge_scalar(b"y")
    z = tr.challenge_scalar(b"z")

    tr.commit_point(b"T_1", proof.T_1)
    tr.commit_point(b"T_3", proof.T_3)
    tr.commit_point(b"T_4", proof.T_4)
    tr.commit_point(b"T_5", proof.T_5)
    tr.commit_point(b"T_6", proof.T_6)

    u = tr.challenge_scalar(b"u")
    x = tr.challenge_scalar(b"x")

    tr.commit_scalar(b"t_x", proof.t_x)
    tr.commit_scalar(b"t_x_blinding", proof.t_x_blinding)
    tr.commit_scalar(b"e_blinding", proof.e_blinding)

    w = tr.challenge_scalar(b"w")

    # device z-fold with wc (verifier.rs:149-193)
    q = len(verifier.constraints)
    tables = build_zfold_tables(verifier.constraints, n, len(verifier.V),
                                include_one=True)
    wL, wR, wO, wV_m = zfold_device(tables, z, q, fr, padded_n)
    from ..r1cs.linear_combination import ONE
    rows, valid, coeffs, T, width = tables[ONE]
    from .prover_device import _zfold_kernel
    z_m = _mont(fr, [z])
    from .prover_device import _pow_table
    zpow_rows = jnp.transpose(_pow_table(z_m, max(q, 1), fr), (1, 0))
    wc_m = fj.neg_mod(
        _zfold_kernel(zpow_rows, jnp.asarray(rows), jnp.asarray(valid),
                      fj._to_mont_jit(jnp.asarray(
                          fj.ints_to_limbs(coeffs, fr.L)), fr),
                      fr, T, width), fr)
    wc = Scalar(fr.from_mont(wc_m)[0])

    a = proof.ipp_proof.a
    b = proof.ipp_proof.b

    # IPA verification scalars: transcript replay on host (serial),
    # s-vector on device (ipp.rs:262-315)
    lg_n = len(proof.ipp_proof.L)
    if lg_n >= 32 or padded_n != (1 << lg_n):
        raise VerificationError("inconsistent IPA proof size")
    tr.innerproduct_domain_sep(padded_n)
    challenges = []
    for L_pt, R_pt in zip(proof.ipp_proof.L, proof.ipp_proof.R):
        tr.commit_point(b"L", L_pt)
        tr.commit_point(b"R", R_pt)
        challenges.append(tr.challenge_scalar(b"u"))
    from .field_host import batch_invert
    challenges_inv, prod_inv = batch_invert(challenges)
    u_sq = [c2.square() for c2 in challenges]
    u_inv_sq = [c2.square() for c2 in challenges_inv]
    if lg_n:
        u_sq_stack = _mont(fr, u_sq)
        s_dev = _s_vector_kernel(u_sq_stack, _mont(fr, [prod_inv]),
                                 lg_n, fr)
    else:
        s_dev = _mont(fr, [prod_inv])

    # g/h scalar assembly + delta on device (verifier.rs:350-390)
    y_inv = y.inverse()
    y_inv_pows = _pow_shifted(_mont(fr, [y_inv]), padded_n, fr)
    n1_mask = np.r_[np.ones(n1, np.uint32),
                    np.zeros(n2 + pad, np.uint32)]
    g_plain, h_plain, delta_m = _gh_scalars_kernel(
        wL, wR, wO, s_dev, y_inv_pows, _mont(fr, [x]), _mont(fr, [a]),
        _mont(fr, [b]), _mont(fr, [u]), n1_mask, padded_n, fr)
    delta = Scalar(fr.from_mont(delta_m)[0])
    wV = [Scalar(v) for v in fr.from_mont(wV_m)]

    # head scalars (13 + m + 2 lg n of them — host, tiny;
    # verifier.rs:392-451)
    r_batch = Scalar.random(verifier.rng)
    x_sqr = x.square()
    x_cube = x * x_sqr
    r_x_sqr = r_batch * x_sqr
    rx = r_batch * x
    rx_cube = r_batch * x_cube
    rx_4 = rx_cube * x
    rx_5 = rx_4 * x
    rx_6 = rx_5 * x
    ux = u * x
    ux_sqr = u * x_sqr
    ux_cube = u * x_cube
    head = [x, x_sqr, x_cube, ux, ux_sqr, ux_cube]
    head += [wv * r_x_sqr for wv in wV]
    head += [rx, rx_cube, rx_4, rx_5, rx_6]
    w_comb = w * (proof.t_x - a * b) \
        + r_batch * (x_sqr * (wc + delta) - proof.t_x)
    head.append(w_comb)
    head.append(-(proof.e_blinding + r_batch * proof.t_x_blinding))
    tail = [s2 for s2 in u_sq] + [s2 for s2 in u_inv_sq]

    head_pts = [proof.A_I1, proof.A_O1, proof.S1,
                proof.A_I2, proof.A_O2, proof.S2]
    head_pts += verifier.V
    head_pts += [proof.T_1, proof.T_3, proof.T_4, proof.T_5, proof.T_6]
    head_pts += [g, h]
    tail_pts = list(proof.ipp_proof.L) + list(proof.ipp_proof.R)

    # assemble the device mega-MSM: [head | G | H | L | R]
    nh = len(head)
    ht_dev, ht_vals, aff_ht = _affine_or_zero(
        head_pts + tail_pts, [v.v for v in head + tail], ctx, g)
    Gd, affG = _pts_cache.get(G[:padded_n], ctx)
    Hd, affH = _pts_cache.get(H[:padded_n], ctx)
    head_plain = jnp.asarray(fj.ints_to_limbs(ht_vals, fr.L))
    scal = jnp.concatenate(
        [head_plain[:, :nh], g_plain, h_plain, head_plain[:, nh:]],
        axis=-1)[None]                               # (1, Lr, total)
    pts = jnp.concatenate(
        [ht_dev[:, :, :nh], Gd, Hd, ht_dev[:, :, nh:]], axis=2)

    res = msm_mod.msm_hybrid(pts, scal, ctx,
                             affine=aff_ht and affG and affH)[0]
    if not res.is_identity():
        raise VerificationError("R1CS proof verification failed")
