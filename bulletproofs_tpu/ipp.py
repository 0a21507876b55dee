"""Inner-product argument (IPA): the log2(n)-round recursive proof that
<a, b> = c relative to committed bases.

Protocol-faithful rewrite of `/root/reference/src/ipp.rs` with identical
transcript schedule: the first fold applies per-element G/H factors
(`ipp.rs:68-136`), subsequent folds are plain (`ipp.rs:138-194`); per round the
prover commits L/R (each an (n+1)-size MSM), draws challenge u, folds scalars
and bases.  The vector math dispatches to the active backend (host ints or
batched TPU limb kernels); the transcript forces one device->host sync of
(L, R) per round, which is inherent to Fiat-Shamir.
"""

import os
from dataclasses import dataclass
from typing import List

# Minimum circuit size for the device-resident IPA (see create_ipp)
DEVICE_IPA_MIN_N = int(os.environ.get("BP_IPA_DEVICE_MIN", "2048"))

from .backend import get_backend
from .ops.field_host import (Scalar, batch_invert, hadamard_product,
                             inner_product)
from .ops.ec_host import G1
from .utils.errors import VerificationError


@dataclass
class InnerProductArgumentProof:
    """`ipp.rs:15-20`"""
    L: List[G1]
    R: List[G1]
    a: Scalar
    b: Scalar


def create_ipp(transcript, Q, G_factors, H_factors, G_vec, H_vec, a_vec,
               b_vec) -> InnerProductArgumentProof:
    """Prover side (`ipp.rs:35-202`).

    Proof is w.r.t. bases G'_i = G_factors_i * G_i, H'_i = H_factors_i * H_i.
    All vectors must share a power-of-two length.
    """
    n = len(G_vec)
    assert n and (n & (n - 1)) == 0, "length must be a power of two"
    assert len(H_vec) == len(a_vec) == len(b_vec) == n
    assert len(G_factors) == len(H_factors) == n

    # device-resident fast path: the implicit-basis IPA
    # (ops/prover_device.py) — no basis folds, one FIXED MSM shape for every
    # round (a cold cache compiles one kernel set, not log2(n) of them), one
    # (L, R) transfer per round for the transcript.
    if n >= DEVICE_IPA_MIN_N and getattr(get_backend(n), "name", "") == "jax":
        from .ops.prover_device import create_ipp_device
        L_vec, R_vec, a_fin, b_fin = create_ipp_device(
            transcript, Q, G_factors, H_factors, G_vec, H_vec, a_vec, b_vec)
        return InnerProductArgumentProof(L=L_vec, R=R_vec, a=a_fin, b=b_fin)

    # native-resident fast path: round state stays in native buffers, only
    # L/R cross per round for the transcript (proofs byte-identical)
    if n >= 2 and getattr(get_backend(n), "name", "") == "cpp":
        from .ops.cpp_backend import create_ipp_rounds
        L_vec, R_vec, a_fin, b_fin = create_ipp_rounds(
            transcript, Q, G_factors, H_factors, G_vec, H_vec, a_vec, b_vec)
        return InnerProductArgumentProof(L=L_vec, R=R_vec, a=a_fin, b=b_fin)

    G, H = list(G_vec), list(H_vec)
    a, b = list(a_vec), list(b_vec)

    transcript.innerproduct_domain_sep(n)

    L_vec, R_vec = [], []
    first_round = True

    while n != 1:
        be = get_backend(n)
        n //= 2
        a_L, a_R = a[:n], a[n:]
        b_L, b_R = b[:n], b[n:]
        G_L, G_R = G[:n], G[n:]
        H_L, H_R = H[:n], H[n:]

        c_L = inner_product(a_L, b_R)
        c_R = inner_product(a_R, b_L)

        if first_round:
            Gf_L, Gf_R = G_factors[:n], G_factors[n:]
            Hf_L, Hf_R = H_factors[:n], H_factors[n:]
            L_scalars = (hadamard_product(a_L, Gf_R)
                         + hadamard_product(b_R, Hf_L) + [c_L])
            R_scalars = (hadamard_product(a_R, Gf_L)
                         + hadamard_product(b_L, Hf_R) + [c_R])
        else:
            L_scalars = a_L + b_R + [c_L]
            R_scalars = a_R + b_L + [c_R]

        L = be.msm(G_R + H_L + [Q], L_scalars)
        R = be.msm(G_L + H_R + [Q], R_scalars)

        transcript.commit_point(b"L", L)
        transcript.commit_point(b"R", R)
        L_vec.append(L)
        R_vec.append(R)

        u = transcript.challenge_scalar(b"u")
        u_inv = u.inverse()

        a = [al * u + u_inv * ar for al, ar in zip(a_L, a_R)]
        b = [bl * u_inv + u * br for bl, br in zip(b_L, b_R)]
        if first_round:
            G = be.fold_points(G_L, G_R, [u_inv * f for f in Gf_L],
                               [u * f for f in Gf_R])
            H = be.fold_points(H_L, H_R, [u * f for f in Hf_L],
                               [u_inv * f for f in Hf_R])
            first_round = False
        else:
            G = be.fold_points(G_L, G_R, u_inv, u)
            H = be.fold_points(H_L, H_R, u, u_inv)

    return InnerProductArgumentProof(L=L_vec, R=R_vec, a=a[0], b=b[0])


def verification_scalars(L_vec, R_vec, n, transcript):
    """Recompute challenges and the s-vector (`ipp.rs:262-315`).

    Returns (u_sq, u_inv_sq, s).
    """
    lg_n = len(L_vec)
    if lg_n >= 32 or n != (1 << lg_n):
        raise VerificationError("inconsistent IPA proof size")

    transcript.innerproduct_domain_sep(n)

    challenges = []
    for L, R in zip(L_vec, R_vec):
        transcript.commit_point(b"L", L)
        transcript.commit_point(b"R", R)
        challenges.append(transcript.challenge_scalar(b"u"))

    challenges_inv, product_chal_inv = batch_invert(challenges)
    challenges_sq = [c.square() for c in challenges]
    challenges_inv_sq = [c.square() for c in challenges_inv]

    # s built inductively: s[0] = prod(u_i^-1); s[i] = s[i - 2^lg(i)] * u_{lg(i)+1}^2
    # (raw-int inner loop: n modmuls dominate verification's Python time)
    r = product_chal_inv.cv.r
    sq_int = [c.v for c in challenges_sq]
    s_int = [product_chal_inv.v]
    append = s_int.append
    for i in range(1, n):
        lg_i = i.bit_length() - 1
        append(s_int[i - (1 << lg_i)] * sq_int[(lg_n - 1) - lg_i] % r)
    cv = product_chal_inv.cv
    s = [Scalar._new(v, cv) for v in s_int]

    return challenges_sq, challenges_inv_sq, s


def batch_verify_ipp(n, G, H, items, rng=None, localize=True):
    """Batch-verify k standalone IPA proofs sharing generator vectors G, H
    with ONE combined check (beyond-reference capability; `ipp.rs:204-260`
    runs one 2n+2lg n+1 MSM per proof).

    items: [(transcript, G_factors, H_factors, P, Q, a, b, L_vec, R_vec)]
    — the `verify_ipp` argument tuple per proof.  Each equation
    expected_P_i == P_i is folded as sum_i rho_i*(expected_P_i - P_i) == 0
    with verifier-chosen random rho_i; the shared-generator MSM is issued
    separately from the small fresh per-proof MSM so device/native
    conversion caches stay hot.  On failure, with localize=True (default)
    the offending proofs are located by bisection over the retained
    per-proof s-vectors (O(b log2 k) extra MSM checks) and a
    `BatchVerificationError` naming their indices is raised (VERDICT r3
    task 7).
    """
    from .utils.errors import BatchVerificationError, bisect_batch_failures
    assert items, "empty batch"
    cv = G[0].cv
    r = cv.r

    def _ones(fs):
        return all((f.v if isinstance(f, Scalar) else int(f)) == 1
                   for f in fs)

    # native fast path for the O(k*n) scalar combination (bp_ipa_svector +
    # bp_axpy_mod_r): at n = 2^16 the Python modmul loops cost ~0.2 s per
    # proof, which would eat the batching win.  BP_IPA_NATIVE_COMB=0 forces
    # the pure-Python combination (A/B + tests; results identical).
    native = None
    if os.environ.get("BP_IPA_NATIVE_COMB", "1") != "0" \
            and all(_ones(it[1]) and _ones(it[2]) for it in items):
        try:
            from .ops.cpp_backend import _CurveABI, get_lib, _ptr
            import ctypes
            import numpy as np
            native = (_CurveABI(cv), get_lib(), _ptr, ctypes, np)
        except Exception:
            native = None

    # per-proof contributions (rho_a/rho_b applied at combine time so the
    # retained s-vectors can be recombined over subsets during bisection)
    per = []
    for i, (transcript, G_factors, H_factors, P, Q, a, b, L_vec,
            R_vec) in enumerate(items):
        u_sq, u_inv_sq, s_or_none = _verification_scalars_lazy(
            L_vec, R_vec, n, transcript, skip_s=bool(native))
        rho = 1 if i == 0 else Scalar.random(rng).v
        rho_a = rho * a.v % r
        rho_b = rho * b.v % r
        if native:
            abi, lib, _p, ctypes, np = native
            lg_n = len(L_vec)
            u_sq_buf = abi.scalars_to_buf(u_sq)
            prod_inv = s_or_none          # prod(u^-1) from the lazy helper
            s_buf = np.zeros(n * abi.Lr, dtype=np.uint64)
            lib.bp_ipa_svector(_p(abi.rparams), _p(u_sq_buf),
                               _p(abi.scalars_to_buf([prod_inv])),
                               ctypes.c_uint64(lg_n), ctypes.c_uint64(n),
                               _p(s_buf))
            s_data = s_buf
        else:
            s_data = [si.v for si in s_or_none]
        head_pts = [Q] + list(L_vec) + list(R_vec) + [P]
        head_scals = [rho * (a.v * b.v % r) % r]
        head_scals += [(-(rho * u.v)) % r for u in u_sq]
        head_scals += [(-(rho * u.v)) % r for u in u_inv_sq]
        head_scals.append((-rho) % r)
        per.append((rho_a, rho_b, s_data, head_pts, head_scals))

    def check(idxs):
        if native:
            abi, lib, _p, ctypes, np = native
            g_buf = np.zeros(n * abi.Lr, dtype=np.uint64)
            h_buf = np.zeros(n * abi.Lr, dtype=np.uint64)
            for i in idxs:
                rho_a, rho_b, s_buf, _, _ = per[i]
                lib.bp_axpy_mod_r(_p(abi.rparams), _p(g_buf),
                                  _p(abi.scalars_to_buf([rho_a])),
                                  _p(s_buf), ctypes.c_uint64(n),
                                  ctypes.c_uint64(0))
                lib.bp_axpy_mod_r(_p(abi.rparams), _p(h_buf),
                                  _p(abi.scalars_to_buf([rho_b])),
                                  _p(s_buf), ctypes.c_uint64(n),
                                  ctypes.c_uint64(1))
            g_comb = abi.buf_to_ints(g_buf, n)
            h_comb = abi.buf_to_ints(h_buf, n)
        else:
            g_comb = [0] * n
            h_comb = [0] * n
            for i in idxs:
                rho_a, rho_b, s_int, _, _ = per[i]
                for j in range(n):
                    g_comb[j] = (g_comb[j] + rho_a * s_int[j]) % r
                s_rev = s_int[::-1]
                for j in range(n):
                    h_comb[j] = (h_comb[j] + rho_b * s_rev[j]) % r
        head_pts, head_scals = [], []
        for i in idxs:
            head_pts += per[i][3]
            head_scals += per[i][4]
        gen_res = get_backend(2 * n).msm(list(G[:n]) + list(H[:n]),
                                         g_comb + h_comb)
        head_res = get_backend(len(head_pts)).msm(head_pts, head_scals)
        return (gen_res + head_res).is_identity()

    k = len(per)
    if check(range(k)):
        return
    if not localize:
        raise VerificationError("IPA batch verification failed")
    raise BatchVerificationError(bisect_batch_failures(check, k))


def _verification_scalars_lazy(L_vec, R_vec, n, transcript, skip_s=False):
    """verification_scalars, optionally WITHOUT the O(n) s-vector build:
    with skip_s the third return is prod(u^-1) (a Scalar) for the native
    s-vector kernel (bp_ipa_svector) instead of the s list."""
    if not skip_s:
        return verification_scalars(L_vec, R_vec, n, transcript)
    lg_n = len(L_vec)
    if lg_n >= 32 or n != (1 << lg_n):
        raise VerificationError("inconsistent IPA proof size")
    transcript.innerproduct_domain_sep(n)
    challenges = []
    for L, R in zip(L_vec, R_vec):
        transcript.commit_point(b"L", L)
        transcript.commit_point(b"R", R)
        challenges.append(transcript.challenge_scalar(b"u"))
    challenges_inv, product_chal_inv = batch_invert(challenges)
    u_sq = [c.square() for c in challenges]
    u_inv_sq = [c.square() for c in challenges_inv]
    return u_sq, u_inv_sq, product_chal_inv


def verify_ipp(n, transcript, G_factors, H_factors, P, Q, G, H, a, b, L_vec,
               R_vec):
    """Verifier side: one mega-MSM of size 2n + 2 lg n + 1 checked against P
    (`ipp.rs:204-260`)."""
    if n >= DEVICE_IPA_MIN_N and getattr(get_backend(n), "name", "") == "jax":
        from .ops.verifier_device import verify_ipp_device
        return verify_ipp_device(n, transcript, G_factors, H_factors, P, Q,
                                 G, H, a, b, L_vec, R_vec)
    u_sq, u_inv_sq, s = verification_scalars(L_vec, R_vec, n, transcript)

    g_times_a_times_s = [(a * s_i) * g_i
                         for g_i, s_i in zip(G_factors, s)][:len(G)]
    inv_s = list(reversed(s))
    h_times_b_div_s = [(b * s_i_inv) * h_i
                       for h_i, s_i_inv in zip(H_factors, inv_s)]
    neg_u_sq = [-u for u in u_sq]
    neg_u_inv_sq = [-u for u in u_inv_sq]

    scalars = ([a * b] + g_times_a_times_s + h_times_b_div_s + neg_u_sq
               + neg_u_inv_sq)
    points = [Q] + list(G) + list(H) + list(L_vec) + list(R_vec)

    expected_P = get_backend(len(points)).msm(points, scalars)
    if expected_P != P:
        raise VerificationError("IPA check failed")
