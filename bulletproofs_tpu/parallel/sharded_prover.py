"""Sharded end-to-end prover: multi-chip witness MSMs + sharded
implicit-basis IPA over a `jax.sharding.Mesh`.

This is the multi-chip decomposition of SURVEY.md section 2.3 completed to a
WHOLE PROOF: the reference's serial `Prover::prove`
(`/root/reference/src/r1cs/prover.rs:322-593`) and IPA fold loop
(`src/ipp.rs:115-130`) become, per round,

- elementwise Montgomery kernels over the n-axis shards (local),
- the half-swap A_k <-> A_{k xor n_j/2}: a `ppermute` shard exchange while
  the swap distance spans shards, a local reshape below that — this is the
  "all-gather at halvings" of SURVEY section 7 hard part 4, reduced to a
  single pairwise exchange by the implicit-basis formulation
  (ops/prover_device.py),
- c_L/c_R inner products via local partial sums + `psum`-style EC-free
  reduction (every tile of the length-n buffer holds a copy of the length
  n_j logical vector, so the masked full-length product sum equals
  (n/n_j) * c — one Montgomery multiply by a static inverse fixes it),
- one sharded two-scalar-set Pippenger MSM over the fixed [G | H] table
  (local bucket accumulation + ppermute butterfly bucket reduction +
  replicated combine, parallel/sharded_msm.py machinery).

The transcript (host, serial) sees exactly the reference byte schedule, so
sharded proofs verify against the single-chip verifier.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ec_jax as ej
from ..ops import field_jax as fj
from ..ops import msm as msm_mod
from ..ops.field_host import Scalar
from .sharded_msm import AXIS, _allreduce_buckets, make_mesh


# ---------------------------------------------------------------------------
# Sharded multi-set MSM
# ---------------------------------------------------------------------------

def _msm_multi_body(points, scalars, ctx, c, n_rounds, wins_per_set, axis,
                    pre_reduce=0, affine=False):
    """shard_map body: local shards -> replicated (3, L, S) totals + the
    global max occupancy (for the guess-verify contract)."""
    S = scalars.shape[0]
    digits = msm_mod._digits_multi(scalars, ctx, c)
    plan = msm_mod.window_plan(ctx, c, n_sets=S)
    buckets, occ = msm_mod.bucket_accumulate(points, digits, ctx, c,
                                             n_rounds, plan=plan,
                                             pre_reduce=pre_reduce,
                                             affine=affine)
    buckets = _allreduce_buckets(buckets, ctx, axis)
    occ = jax.lax.pmax(occ, axis)
    rowsum, colsum = msm_mod.bucket_rowcol(buckets, ctx, c)
    out = msm_mod.combine_from_rowcol(rowsum, colsum, ctx, c,
                                      wins_per_set=wins_per_set)
    return out, occ


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _msm_multi_sharded_jit(points, scalars, ctx, c, mesh, n_rounds,
                           pre_reduce=0, affine=False):
    W = -(-ctx.cv.fr.n_bits // c)
    body = partial(_msm_multi_body, ctx=ctx, c=c, n_rounds=n_rounds,
                   wins_per_set=W, axis=AXIS, pre_reduce=pre_reduce,
                   affine=affine)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, None, AXIS)),
        out_specs=(P(None, None, None), P()),
        check_vma=False,
    )(points, scalars)


def msm_multi_sharded(points, scalars, ctx, c, mesh, affine=False):
    """points (3, L, n), scalars (S, Lr, n) global (sharded or shardable)
    -> list of S host G1.  Guess-verify static round count per shard, with
    the same pre-reduction escalation as the single-chip driver (witness
    MSMs carry degenerate bit-vector scalars)."""
    d = mesh.devices.size
    ns = points.shape[2] // d
    rounds = msm_mod.occupancy_guess(max(ns, 1), ctx, c, dup=False)
    pre = 0
    while True:
        out, occ = _msm_multi_sharded_jit(points, scalars, ctx, c, mesh,
                                          rounds, pre, affine)
        occ = int(occ)
        if occ <= rounds:
            break
        rounds, pre = msm_mod._escalate(occ, rounds, pre)
    return ej.from_device_points(out, ctx)


# ---------------------------------------------------------------------------
# Sharded implicit-basis IPA round
# ---------------------------------------------------------------------------

def _swap_halves_local(X, n_j):
    Lr, ns = X.shape
    half = n_j // 2
    Xr = X.reshape(Lr, ns // n_j, 2, half)
    return Xr[:, :, ::-1, :].reshape(Lr, ns)


def _bit_mask_local(n_j, ns, axis):
    """0/1 mask of 'position is in the high half of its n_j block' for this
    shard's contiguous slice."""
    half = n_j // 2
    if n_j <= ns:
        return jnp.asarray(np.tile(
            np.r_[np.zeros(half, np.uint32), np.ones(half, np.uint32)],
            ns // n_j))
    # whole shard is in one half: decide from the global block offset
    s = jax.lax.axis_index(axis)
    hi = ((s * ns) % n_j) >= half
    return jnp.broadcast_to(hi.astype(jnp.uint32), (ns,))


def _swap_sharded(X, n_j, ns, axis, d):
    half = n_j // 2
    if half >= ns:
        dist = half // ns
        perm = [(i, i ^ dist) for i in range(d)]
        return jax.lax.ppermute(X, axis, perm)
    return _swap_halves_local(X, n_j)


def _round_a_body(A, B, rG, rH, ctx, n_j, ns, d, inv_tiles_m, axis):
    """Phase A of an IPA round: build the local L/R MSM scalar slices over
    the local [G|H] table and the replicated c_L/c_R."""
    fr = ctx.fr
    bit = _bit_mask_local(n_j, ns, axis)
    swapA = _swap_sharded(A, n_j, ns, axis, d)
    swapB = _swap_sharded(B, n_j, ns, axis, d)

    prod_ab = fj.mont_mul(A, swapB, fr)
    zero = jnp.zeros_like(prod_ab)
    cL_part = _tree_sum(jnp.where(bit == 0, prod_ab, zero), fr)
    cR_part = _tree_sum(jnp.where(bit == 1, prod_ab, zero), fr)
    # EC-free scalar all-reduce: psum over 16-bit limbs stays exact for
    # any realistic mesh (< 2^16 devices), then one mod-reduction
    cL = _mod_psum(cL_part, fr, axis)
    cR = _mod_psum(cR_part, fr, axis)
    cL = fj.mont_mul(cL, inv_tiles_m, fr)
    cR = fj.mont_mul(cR, inv_tiles_m, fr)

    prodG = fj.mont_mul(swapA, rG, fr)
    prodH = fj.mont_mul(swapB, rH, fr)
    sG_L = jnp.where(bit == 1, prodG, 0)
    sG_R = jnp.where(bit == 0, prodG, 0)
    sH_L = jnp.where(bit == 0, prodH, 0)
    sH_R = jnp.where(bit == 1, prodH, 0)

    def plain(x):
        return fj.mont_mul(x, jnp.zeros_like(x).at[0].set(1), fr)

    L_scal = plain(jnp.concatenate([sG_L, sH_L], axis=-1))
    R_scal = plain(jnp.concatenate([sG_R, sH_R], axis=-1))
    return (jnp.stack([L_scal, R_scal], axis=0),
            plain(cL), plain(cR))


def _tree_sum(prod, fr):
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


def _mod_psum(x, fr, axis):
    """Exact cross-shard sum of one field element: raw 32-bit limb psum
    (16-bit canonical limbs cannot overflow for < 2^16 shards), then carry
    normalization + one conditional subtract per doubling level."""
    raw = jax.lax.psum(x, axis)
    # raw columns < n_shards * 2^16: renormalize then reduce mod p by
    # repeated conditional subtraction of shifted moduli is overkill —
    # carry-normalize to L+1 limbs and use the generic sub-if-ge chain a
    # few times (n_shards is small)
    cols = fj._carry_norm(raw, fr.L + 2)
    # value < n_shards * p: subtract p until below (log2(n_shards) + 1
    # conditional subtracts of p*2^k, high k first, keeps it cheap/static)
    D_MAX = 16  # supports up to 2^16-shard meshes at trace-time cost only
    for k in range(D_MAX, -1, -1):
        shifted = fr.mod_int << k
        if shifted >> (16 * (fr.L + 2)):
            continue
        m = jnp.asarray(fj.ints_to_limbs([shifted], fr.L + 2))
        cols = fj._sub_if_ge(cols, m)
    return cols[:fr.L]


def _round_b_body(A, B, rG, rH, u_m, u_inv_m, ctx, n_j, ns, d, axis):
    """Phase B: fold A/B and update the running challenge products."""
    fr = ctx.fr
    bit = _bit_mask_local(n_j, ns, axis)
    swapA = _swap_sharded(A, n_j, ns, axis, d)
    swapB = _swap_sharded(B, n_j, ns, axis, d)
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


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _round_a_jit(A, B, rG, rH, ctx, n_j, mesh, inv_tiles):
    d = mesh.devices.size
    ns = A.shape[-1] // d
    inv_tiles_m = jnp.asarray(fj.ints_to_limbs([inv_tiles], ctx.fr.L))
    body = partial(_round_a_body, ctx=ctx, n_j=n_j, ns=ns, d=d,
                   inv_tiles_m=inv_tiles_m, axis=AXIS)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS),) * 4,
        out_specs=(P(None, None, AXIS), P(None, None), P(None, None)),
        check_vma=False,
    )(A, B, rG, rH)


@partial(jax.jit, static_argnums=(6, 7, 8))
def _round_b_jit(A, B, rG, rH, u_m, u_inv_m, ctx, n_j, mesh):
    d = mesh.devices.size
    ns = A.shape[-1] // d
    body = partial(_round_b_body, ctx=ctx, n_j=n_j, ns=ns, d=d, axis=AXIS)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS),) * 4 + (P(None, None),) * 2,
        out_specs=(P(None, AXIS),) * 4,
        check_vma=False,
    )(A, B, rG, rH, u_m, u_inv_m)


def create_ipp_sharded(transcript, Q, G_factors, H_factors, G_vec, H_vec,
                       a_vec, b_vec, mesh=None):
    """Sharded `create_ipp` (`ipp.rs:35-202` transcript schedule): the whole
    O(n) state lives sharded across the mesh; per round one ppermute
    half-swap, one sharded 2-set MSM, one (L, R) host sync for Fiat-Shamir.

    Crossover: when the shard slice would drop below one element per device
    the arrays stay full-length (the tiled representation never shrinks), so
    no resharding is ever needed — small rounds just do less unique work.
    """
    from ..config import curve
    cv = curve()
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr
    mesh = mesh or make_mesh()
    d = mesh.devices.size
    n = len(G_vec)
    assert n % d == 0, "n must divide the mesh for the sharded IPA"

    sh_pts = NamedSharding(mesh, P(None, None, AXIS))
    sh_vec = NamedSharding(mesh, P(None, AXIS))

    # global table in PER-SHARD block order [G_0|H_0|G_1|H_1|...]: shard s
    # then holds exactly [G_s | H_s], matching the [sG | sH] concat order
    # the round kernel emits for its local scalar slices
    Gd, affG = ej.to_device_points_affine(list(G_vec), ctx)
    Hd, affH = ej.to_device_points_affine(list(H_vec), ctx)
    affine = affG and affH
    L_fp = ctx.fp.L
    ns = n // d
    blocks = jnp.stack([Gd.reshape(3, L_fp, d, ns),
                        Hd.reshape(3, L_fp, d, ns)], axis=3)  # (3,L,d,2,ns)
    pts = jax.device_put(blocks.reshape(3, L_fp, 2 * n), sh_pts)

    def mont_sharded(vals):
        arr = fr.to_mont([v.v if hasattr(v, "v") else int(v) for v in vals])
        return jax.device_put(arr, sh_vec)

    A = mont_sharded(a_vec)
    B = mont_sharded(b_vec)
    rG = mont_sharded(G_factors)
    rH = mont_sharded(H_factors)
    Qd = ej.to_device_points([Q], ctx)

    transcript.innerproduct_domain_sep(n)

    L_list, R_list = [], []
    n_j = n
    tiles = 1
    c = msm_mod.pick_window(max(2 * n // d, 16))
    while n_j != 1:
        inv_tiles = pow(tiles, -1, cv.r) * fr.fp.mont_r % cv.r \
            if tiles > 1 else fr.fp.mont_r % cv.r
        scal2, cL_p, cR_p = _round_a_jit(A, B, rG, rH, ctx, n_j, mesh,
                                         inv_tiles)
        Lr_pts = msm_multi_sharded(pts, scal2, ctx, c, mesh,
                                   affine=affine)
        cL = Scalar(fj.limbs_to_ints(np.asarray(cL_p))[0])
        cR = Scalar(fj.limbs_to_ints(np.asarray(cR_p))[0])
        L = Lr_pts[0] + Q * cL
        R = Lr_pts[1] + Q * cR

        transcript.commit_point(b"L", L)
        transcript.commit_point(b"R", R)
        L_list.append(L)
        R_list.append(R)

        u = transcript.challenge_scalar(b"u")
        u_inv = u.inverse()
        u_m = fr.to_mont([u.v])
        u_inv_m = fr.to_mont([u_inv.v])
        A, B, rG, rH = _round_b_jit(A, B, rG, rH, u_m, u_inv_m, ctx, n_j,
                                    mesh)
        n_j //= 2
        tiles *= 2

    a_fin = Scalar(fr.from_mont(A[:, :1])[0])
    b_fin = Scalar(fr.from_mont(B[:, :1])[0])
    return L_list, R_list, a_fin, b_fin


# ---------------------------------------------------------------------------
# Whole proof on the mesh
# ---------------------------------------------------------------------------

def prove_sharded(prover, G, H, mesh=None):
    """Sharded `Prover.prove` (`prover.rs:322-593`): witness-commitment MSMs
    and the IPA run sharded over the mesh; transcript schedule and blinding
    draws are bit-identical to the host path (r1cs/prover.py::_prove), so
    sharded proofs verify against any backend's verifier.

    Circuit-sized field-vector work (l/r polys, z-fold) stays replicated on
    the host here — it is O(n) scalar math against the O(n * group-op) EC
    work that the mesh actually scales; the single-chip device prover
    (ops/prover_device.py) owns the device version of those kernels.
    """
    from ..config import curve
    from ..utils.errors import InvalidGeneratorsLength
    from ..utils.vector_poly import Poly6, VecPoly3
    from ..ops.field_host import random_scalars, inner_product, \
        vandermonde_vector
    from ..ops.ec_host import commit_to_field_element
    from ..r1cs.proof import R1CSProof
    from .. import ipp as ipp_mod

    mesh = mesh or make_mesh()
    d = mesh.devices.size
    cv = curve()
    ctx = ej.CurveCtx(cv)
    fr = ctx.fr
    tr = prover.transcript
    rng = prover.rng

    tr.append_u64(b"m", len(prover.v))

    n1 = len(prover.a_L)
    if len(G) < n1:
        raise InvalidGeneratorsLength()
    assert (2 * n1) % d == 0, "2*n1 must divide the mesh size"

    i_blinding1 = Scalar.random(rng)
    o_blinding1 = Scalar.random(rng)
    s_blinding1 = Scalar.random(rng)
    s_L1 = random_scalars(n1, rng)
    s_R1 = random_scalars(n1, rng)

    def plain(vals):
        return jnp.asarray(fj.ints_to_limbs([v.v for v in vals], fr.L))

    Gd1, affG1 = ej.to_device_points_affine(G[:n1], ctx)
    Hd1, affH1 = ej.to_device_points_affine(H[:n1], ctx)
    pts1 = jnp.concatenate([Gd1, Hd1], axis=2)
    zero_n1 = [Scalar.zero()] * n1
    sets1 = jnp.stack([plain(prover.a_L + prover.a_R),
                       plain(prover.a_O + zero_n1),
                       plain(s_L1 + s_R1)], axis=0)
    c = msm_mod.pick_window(max(2 * n1 // d, 16))
    base1 = msm_multi_sharded(pts1, sets1, ctx, c, mesh,
                              affine=affG1 and affH1)
    h_ = prover.h
    A_I1 = base1[0] + h_ * i_blinding1
    A_O1 = base1[1] + h_ * o_blinding1
    S1 = base1[2] + h_ * s_blinding1

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
    assert padded_n % d == 0, "padded n must divide the mesh size"

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
        # phase-2 slice is small and mesh divisibility is not guaranteed:
        # use the host backend (identical results by construction)
        from ..backend import get_backend
        be = get_backend(2 * n2 + 1)
        A_I2 = be.msm(G[n1:n] + H[n1:n] + [h_],
                      prover.a_L[n1:] + prover.a_R[n1:] + [i_blinding2])
        A_O2 = be.msm(G[n1:n] + [h_], prover.a_O[n1:] + [o_blinding2])
        S2 = be.msm(G[n1:n] + H[n1:n] + [h_], s_L2 + s_R2 + [s_blinding2])
    else:
        ident = type(prover.g).identity(cv)
        A_I2 = A_O2 = S2 = ident

    tr.commit_point(b"A_I2", A_I2)
    tr.commit_point(b"A_O2", A_O2)
    tr.commit_point(b"S2", S2)

    y = tr.challenge_scalar(b"y")
    z = tr.challenge_scalar(b"z")

    wL, wR, wO, wV = prover._flattened_constraints(z)

    l_poly = VecPoly3(n)
    r_poly = VecPoly3(n)
    y_inv = y.inverse()
    exp_y_inv = vandermonde_vector(y_inv, padded_n)
    exp_y = Scalar.one()
    sL = s_L1 + s_L2
    sR = s_R1 + s_R2
    for i in range(n):
        l_poly.c[1][i] = prover.a_L[i] + exp_y_inv[i] * wR[i]
        l_poly.c[2][i] = prover.a_O[i]
        l_poly.c[3][i] = sL[i]
        r_poly.c[0][i] = wO[i] - exp_y
        r_poly.c[1][i] = exp_y * prover.a_R[i] + wL[i]
        r_poly.c[3][i] = exp_y * sR[i]
        exp_y = exp_y * y

    t_poly = VecPoly3.special_inner_product(l_poly, r_poly)

    t_1_blinding = Scalar.random(rng)
    t_3_blinding = Scalar.random(rng)
    t_4_blinding = Scalar.random(rng)
    t_5_blinding = Scalar.random(rng)
    t_6_blinding = Scalar.random(rng)

    g_ = prover.g
    T_1 = commit_to_field_element(g_, h_, t_poly.t1, t_1_blinding)
    T_3 = commit_to_field_element(g_, h_, t_poly.t3, t_3_blinding)
    T_4 = commit_to_field_element(g_, h_, t_poly.t4, t_4_blinding)
    T_5 = commit_to_field_element(g_, h_, t_poly.t5, t_5_blinding)
    T_6 = commit_to_field_element(g_, h_, t_poly.t6, t_6_blinding)

    tr.commit_point(b"T_1", T_1)
    tr.commit_point(b"T_3", T_3)
    tr.commit_point(b"T_4", T_4)
    tr.commit_point(b"T_5", T_5)
    tr.commit_point(b"T_6", T_6)

    u = tr.challenge_scalar(b"u")
    x = tr.challenge_scalar(b"x")

    t_2_blinding = inner_product(wV, prover.v_blinding)
    t_blinding_poly = Poly6(t_1_blinding, t_2_blinding, t_3_blinding,
                            t_4_blinding, t_5_blinding, t_6_blinding)

    t_x = t_poly.eval(x)
    t_x_blinding = t_blinding_poly.eval(x)
    l_vec = l_poly.eval(x) + [Scalar.zero()] * pad
    r_vec = r_poly.eval(x)
    for _ in range(n, padded_n):
        r_vec.append(-exp_y)
        exp_y = exp_y * y

    i_blinding = i_blinding1 + u * i_blinding2
    o_blinding = o_blinding1 + u * o_blinding2
    s_blinding = s_blinding1 + u * s_blinding2
    e_blinding = x * (i_blinding + x * (o_blinding + x * s_blinding))

    tr.commit_scalar(b"t_x", t_x)
    tr.commit_scalar(b"t_x_blinding", t_x_blinding)
    tr.commit_scalar(b"e_blinding", e_blinding)

    w = tr.challenge_scalar(b"w")
    Q = g_ * w

    one = Scalar.one()
    G_factors = [one] * n1 + [u] * (n2 + pad)
    H_factors = [yi * uf for yi, uf in zip(exp_y_inv, G_factors)]

    L_list, R_list, a_fin, b_fin = create_ipp_sharded(
        tr, Q, G_factors, H_factors, G[:padded_n], H[:padded_n],
        l_vec, r_vec, mesh)
    ipp_proof = ipp_mod.InnerProductArgumentProof(
        L=L_list, R=R_list, a=a_fin, b=b_fin)

    return R1CSProof(A_I1=A_I1, A_O1=A_O1, S1=S1, A_I2=A_I2, A_O2=A_O2,
                     S2=S2, T_1=T_1, T_3=T_3, T_4=T_4, T_5=T_5, T_6=T_6,
                     t_x=t_x, t_x_blinding=t_x_blinding,
                     e_blinding=e_blinding, ipp_proof=ipp_proof)
