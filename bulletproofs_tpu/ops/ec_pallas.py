"""Pallas (Mosaic) fused kernels for the EC hot ops.

The XLA path (ops/ec_jax.py) reaches ~20% of VPU integer peak: every scan
stage materializes its operands. These kernels run the COMPLETE EC addition
(two stacked 6-wide Montgomery multiplies + add/sub chains) as one Mosaic
kernel with all intermediates resident in VMEM, tiled over the batch axis.

The arithmetic is literally the shared field_jax/ec_jax code: inside a
Pallas kernel the loaded tiles are ordinary traced arrays, so the XLA and
Pallas paths share one implementation of the group law.  Pallas kernels may
not capture array constants, so the modulus limbs are threaded in as a
(broadcast) kernel input through a tiny ctx shim.
"""

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ec_jax as ej

# batch tile (lanes); multiple of 128
TILE = 512


def _shim(ctx, mod):
    """FieldCtx/CurveCtx stand-in whose constants are traced kernel inputs."""
    f = SimpleNamespace(L=ctx.fp.L, mod=mod, fp=ctx.fp.fp,
                        mod_int=ctx.fp.mod_int)
    return SimpleNamespace(fp=f, b3=ctx.b3, cv=ctx.cv)


def _add_kernel(ctx):
    def kernel(p_ref, q_ref, mod_ref, o_ref):
        kctx = _shim(ctx, mod_ref[:])
        o_ref[:] = ej.ec_add(p_ref[:], q_ref[:], kctx)
    return kernel


@partial(jax.jit, static_argnums=(2,))
def ec_add_pallas(P, Q, ctx):
    """Batched complete EC add via one fused Mosaic kernel.
    P, Q: (3, L, n) with n a multiple of TILE (caller pads)."""
    n = P.shape[2]
    L = P.shape[1]
    assert n % TILE == 0, "batch must be padded to the pallas tile"
    grid = (n // TILE,)
    spec = pl.BlockSpec((3, L, TILE), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    mod_spec = pl.BlockSpec((L, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    mod = jnp.asarray(ctx.fp.mod)
    return pl.pallas_call(
        _add_kernel(ctx),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        grid=grid,
        in_specs=[spec, spec, mod_spec],
        out_specs=spec,
    )(P, Q, mod)
