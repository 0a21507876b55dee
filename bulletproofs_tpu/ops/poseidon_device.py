"""Device (JAX/TPU) batched Poseidon permutation.

The reference evaluates Poseidon natively one permutation at a time
(`/root/reference/src/r1cs/gadgets/helper_constraints/poseidon.rs:202-293`);
every sparse-Merkle-tree update pays depth x serial permutations (the hot
loop of `VanillaSparseMerkleTree_4::update`, smt4 helper:89).  Here the
whole permutation is a batched limb kernel: state is (Lr, width, batch)
Montgomery, each of the three round phases is one `lax.scan` over its
per-round key slices, the s-box is 2-3 stacked Montgomery multiplies and
the MDS layer is a width^2 stacked multiply + tree sum — so thousands of
hashes (bulk SMT updates, Merkle tree builds) run at full VPU width.

Bit-exact vs the host `Poseidon_permutation` (tests/test_poseidon.py);
`SboxType.Inverse` maps 0 -> 0 (Fermat) where the host raises — the host
is the reference-faithful scalar path, this is the throughput path.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import curve
from . import field_jax as fj
from .field_host import Scalar


class _PoseidonDeviceCtx:
    """Cached device constants per (curve, width, round schedule)."""

    _cache = {}

    @classmethod
    def get(cls, params):
        key = (params.cv.name, params.width, params.full_rounds_beginning,
               params.partial_rounds, params.full_rounds_end)
        if key in cls._cache:
            return cls._cache[key]
        fr = fj.FieldCtx(params.cv.fr)
        w = params.width
        mont = lambda v: (v % params.cv.r) * params.cv.fr.mont_r \
            % params.cv.r

        def keys_block(start, count):
            vals = [mont(params.round_keys[start * w + r * w + i].v)
                    for r in range(count) for i in range(w)]
            arr = fj.ints_to_limbs(vals, fr.L)        # (Lr, count*w)
            return np.ascontiguousarray(
                arr.reshape(fr.L, count, w).transpose(1, 0, 2))[..., None]

        rb, rp, re = (params.full_rounds_beginning, params.partial_rounds,
                      params.full_rounds_end)
        mds_vals = [mont(params.mds[j][i].v)
                    for j in range(w) for i in range(w)]
        mds = fj.ints_to_limbs(mds_vals, fr.L).reshape(fr.L, w, w, 1)
        ctx = {
            "fr": fr, "w": w,
            "keys_full_b": keys_block(0, rb),         # (rb, Lr, w, 1)
            "keys_partial": keys_block(rb, rp),
            "keys_full_e": keys_block(rb + rp, re),
            "mds": np.ascontiguousarray(mds),         # (Lr, w, w, 1)
        }
        cls._cache[key] = ctx
        return ctx


def _sbox(x, sbox, fr):
    from ..models.helper_constraints.poseidon import SboxType
    if sbox == SboxType.Cube:
        return fj.mont_mul(fj.mont_sq(x, fr), x, fr)
    if sbox == SboxType.Quint:
        return fj.mont_mul(fj.mont_sq(fj.mont_sq(x, fr), fr), x, fr)
    if sbox == SboxType.Inverse:
        return fj.inv_mont(x, fr)
    raise ValueError(f"unknown sbox {sbox}")


def _linear(state, mds, fr):
    """state (Lr, w, batch); out[i] = sum_j state[j] * mds[j][i]."""
    prod = fj.mont_mul(state[:, :, None], jnp.asarray(mds), fr)
    # (Lr, w_j, w_i, batch): tree-sum over j
    t = prod
    n = t.shape[1]
    while n > 1:
        half = (n + 1) // 2
        left = t[:, :half]
        right = t[:, half:n]
        if right.shape[1] < half:
            right = jnp.concatenate(
                [right, jnp.zeros((t.shape[0], half - right.shape[1])
                                  + t.shape[2:], t.dtype)], axis=1)
        t = fj.add_mod(left, right, fr)
        n = half
    return t[:, 0]                                    # (Lr, w, batch)


@partial(jax.jit, static_argnums=(1, 2))
def _permute_kernel(state, sbox, params):
    pctx = _PoseidonDeviceCtx.get(params)
    fr = pctx["fr"]
    w = pctx["w"]
    mds = pctx["mds"]

    def full_round(st, keys):
        st = fj.add_mod(st, keys, fr)
        st = _sbox(st, sbox, fr)
        return _linear(st, mds, fr), None

    def partial_round(st, keys):
        st = fj.add_mod(st, keys, fr)
        last = _sbox(st[:, w - 1:w], sbox, fr)
        st = jnp.concatenate([st[:, :w - 1], last], axis=1)
        return _linear(st, mds, fr), None

    state, _ = jax.lax.scan(full_round, state,
                            jnp.asarray(pctx["keys_full_b"]))
    state, _ = jax.lax.scan(partial_round, state,
                            jnp.asarray(pctx["keys_partial"]))
    state, _ = jax.lax.scan(full_round, state,
                            jnp.asarray(pctx["keys_full_e"]))
    return state


def poseidon_permutation_batch(columns, params, sbox):
    """columns: list of `width` lists of Scalars (each length n) ->
    list of `width` lists of Scalars: n permutations in one batched kernel
    (the device analog of n serial `Poseidon_permutation` calls).

    The batch is padded to the next power of two (zero states) so one
    compiled kernel serves ALL sizes in its bucket: callers like the SMT
    bulk update present a different n per tree level, and per-shape
    compiles through the device tunnel (~30 s each) would otherwise
    dominate the whole workload."""
    pctx = _PoseidonDeviceCtx.get(params)
    fr = pctx["fr"]
    w = params.width
    n = len(columns[0])
    n_pad = max(8, 1 << (n - 1).bit_length())
    flat = []
    pad_tail = [0] * (n_pad - n)
    for col in columns:
        flat.extend(s.v for s in col)
        flat.extend(pad_tail)
    state = fr.to_mont(flat).reshape(fr.L, w, n_pad)
    out = _permute_kernel(state, sbox, params)
    ints = fr.from_mont(out.reshape(fr.L, w * n_pad))
    return [[Scalar(v, params.cv) for v in ints[i * n_pad:i * n_pad + n]]
            for i in range(w)]


def poseidon_hash_2_batch(xl, xr, params, sbox):
    """Batched `Poseidon_hash_2` (padding convention of
    helper_constraints/poseidon.py): n 2:1 hashes -> n Scalars."""
    from ..models.helper_constraints.poseidon import ZERO_CONST
    n = len(xl)
    zeros = [Scalar(ZERO_CONST, params.cv)] * n
    return poseidon_permutation_batch([zeros, list(xl), list(xr)],
                                      params, sbox)[1]


def poseidon_hash_4_batch(children_lists, params, sbox):
    """Batched `Poseidon_hash_4`: n lists of 4 children -> n Scalars
    (width-5 permutation, [ZERO | c0..c3] columns, output slot 1)."""
    from ..models.helper_constraints.poseidon import ZERO_CONST
    n = len(children_lists)
    zeros = [Scalar(ZERO_CONST, params.cv)] * n
    cols = [zeros] + [[cl[i] for cl in children_lists] for i in range(4)]
    return poseidon_permutation_batch(cols, params, sbox)[1]


def poseidon_hash_8_batch(children_lists, params, sbox):
    """Batched `Poseidon_hash_8`: n lists of 8 children -> n Scalars
    (width-9 permutation)."""
    from ..models.helper_constraints.poseidon import ZERO_CONST
    n = len(children_lists)
    zeros = [Scalar(ZERO_CONST, params.cv)] * n
    cols = [zeros] + [[cl[i] for cl in children_lists] for i in range(8)]
    return poseidon_permutation_batch(cols, params, sbox)[1]
