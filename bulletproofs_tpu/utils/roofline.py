"""Roofline harness: measured in-loop kernel throughput vs a documented
speed-of-light model for the TPU VPU.

The north star requires every hot field/curve kernel to be benchmarked
against its speed-of-light roofline.  The protocol's hot kernels are all
VPU-bound integer limb arithmetic (no MXU use yet — see NOTES.md roadmap),
so the model is op-counting against the VPU's integer issue rate:

- `mont_mul` (separated CIOS, ops/field_jax.py): per limb of `a` the kernel
  issues L partial-product multiplies + L reduction multiplies + ~6L
  mask/shift/add ops => ~2L^2 int multiplies + ~6L^2 simple int ops.
- `ec_add` (complete RCB16 a=0): 12 mont_muls + ~16 add/sub/mul_small
  chains of ~6L ops each.

Speed of light: v5e TensorCore VPU = 4 SIMD units x (8, 128) lanes at
~0.94 GHz ~= 3.85e12 int32 ops/s IF int32 multiply issues at 1 op/lane/cycle.
TPU VPUs emulate 32-bit integer multiplies (multi-op sequences), so the
achievable ceiling is lower by the emulation factor; we report utilization
against the optimistic 1-op model and note the caveat.

Measurements are IN-LOOP (a fori_loop dependent chain of wide batched ops,
the exact shape of the MSM bucket loop): standalone dispatches through the
axon tunnel carry ~30 ms launch latency and measure nothing (NOTES.md).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ec_jax as ej
from ..ops import field_jax as fj

VPU_INT_OPS_PER_S = 3.85e12     # optimistic v5e model (see module doc)


def mont_mul_op_count(L):
    """~int ops per Montgomery multiply (separated CIOS over L limbs)."""
    return 2 * L * L + 6 * L * L


def ec_add_op_count(L):
    """~int ops per complete EC add (12 mont_muls + cheap chains)."""
    return 12 * mont_mul_op_count(L) + 16 * 6 * L


@partial(jax.jit, static_argnums=(1, 2))
def _ec_add_chain(P, iters, ctx):
    def body(i, acc):
        return ej.ec_add(acc, P, ctx)
    return jax.lax.fori_loop(0, iters, body, P)


@partial(jax.jit, static_argnums=(1, 2))
def _mont_mul_chain(a, iters, fctx):
    def body(i, acc):
        return fj.mont_mul(acc, a, fctx)
    return jax.lax.fori_loop(0, iters, body, a)


def _time(fn, *args):
    # device_get, NOT block_until_ready: on the round-5 axon runtime
    # block_until_ready returned without waiting for the remote execution
    # (roofline measured 90x the speed-of-light model — pure enqueue
    # time).  Fetching the bytes is an unfakeable sync.
    jax.device_get(fn(*args))           # compile + warm
    t0 = time.time()
    jax.device_get(fn(*args))
    return time.time() - t0


def roofline_report(ctx=None, batch=8192, iters=100):
    """Measure in-loop ec_add / mont_mul throughput and compare to the
    speed-of-light model.  Returns a dict (also useful as bench extras).

    Lanes must hold DISTINCT values: XLA folds broadcast-op-broadcast into
    scalar-width ops, so a repeated-single-point batch measures nothing."""
    import random
    import numpy as np
    from ..config import curve
    ctx = ctx or ej.CurveCtx(curve())
    L = ctx.fp.L

    # random limb arrays: the complete formulas are branch-free and data-
    # independent, so throughput is identical for invalid points, and
    # random lanes cannot be algebraically collapsed by the compiler
    npr = np.random.RandomState(3)
    P = jnp.asarray(npr.randint(0, 1 << 16, size=(3, L, batch))
                    .astype(np.uint32))

    t_add = _time(_ec_add_chain, P, iters, ctx) / iters
    adds_per_s = batch / t_add

    a = jnp.asarray(npr.randint(0, 1 << 16, size=(L, batch))
                    .astype(np.uint32))
    t_mul = _time(_mont_mul_chain, a, iters, ctx.fp) / iters
    muls_per_s = batch / t_mul

    sol_adds = VPU_INT_OPS_PER_S / ec_add_op_count(L)
    sol_muls = VPU_INT_OPS_PER_S / mont_mul_op_count(L)
    return {
        "limbs": L,
        "batch": batch,
        "ec_add_per_s": adds_per_s,
        "ec_add_speed_of_light_per_s": sol_adds,
        "ec_add_utilization": adds_per_s / sol_adds,
        "mont_mul_per_s": muls_per_s,
        "mont_mul_speed_of_light_per_s": sol_muls,
        "mont_mul_utilization": muls_per_s / sol_muls,
        "model_note": "SoL assumes 1-op int32 multiply; TPU emulates "
                      "int32 mult, so real ceiling is lower (NOTES.md)",
    }
