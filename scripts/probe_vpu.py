"""VPU micro-probe: in-loop throughput of the candidate limb primitives.

Decides the ec_add strategy: if the TPU emulates int32 multiplies (multi-op
sequences) while f32 FMA issues at full rate, an 8-bit-limb f32 CIOS
formulation beats the current 16-bit uint32 one despite 4x the partial
products.  Run: python scripts/probe_vpu.py
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 200
SHAPE = (24, 6, 8192)        # the ec_add stacked-montmul working shape


@partial(jax.jit, static_argnums=(1,))
def chain_u32_mul(x, iters):
    def body(i, acc):
        return (acc * x + 1) & jnp.uint32(0xFFFF)
    return jax.lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnums=(1,))
def chain_u32_addshift(x, iters):
    def body(i, acc):
        return ((acc + x) >> 1) & jnp.uint32(0xFFFF)
    return jax.lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnums=(1,))
def chain_f32_fma(x, iters):
    def body(i, acc):
        return acc * x + 1.0
    return jax.lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnums=(1,))
def chain_f32_fma_wide(x, iters):
    """4 independent FMAs per step (expose ILP)."""
    def body(i, accs):
        a, b, c, d = accs
        return (a * x + 1.0, b * x + 2.0, c * x + 3.0, d * x + 4.0)
    return jax.lax.fori_loop(0, iters, body, (x, x + 1, x + 2, x + 3))


@partial(jax.jit, static_argnums=(1,))
def chain_u32_mul_wide(x, iters):
    def body(i, accs):
        a, b, c, d = accs
        m = jnp.uint32(0xFFFF)
        return ((a * x) & m, (b * x) & m, (c * x) & m, (d * x) & m)
    return jax.lax.fori_loop(0, iters, body, (x, x + 1, x + 2, x + 3))


@partial(jax.jit, static_argnums=(1,))
def chain_i8_matmul(a, iters):
    """MXU probe: int8 (batch, 48) x (48, 96) -> int32, the REDC m*N shape."""
    T = jnp.ones((48, 96), jnp.int8)

    def body(i, acc):
        p = jax.lax.dot_general(
            acc.astype(jnp.int8), T,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return p[:, :48] & 127
    return jax.lax.fori_loop(0, iters, body, a)


def bench(fn, x, n_ops_per_iter, name):
    out = fn(x, ITERS)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(x, ITERS)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS
    print(f"PROBE {name}: {n_ops_per_iter/dt/1e12:.3f} T ops/s "
          f"({dt*1e6:.1f} us/iter)", flush=True)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    n = int(np.prod(SHAPE))
    xu = jnp.asarray(np.random.RandomState(0).randint(
        1, 1 << 15, size=SHAPE).astype(np.uint32))
    xf = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(
        np.float32) + 1.0)

    bench(chain_u32_mul, xu, 2 * n, "u32_mul_and_add")
    bench(chain_u32_addshift, xu, 3 * n, "u32_add_shift_and")
    bench(chain_f32_fma, xf, 2 * n, "f32_fma")
    bench(chain_f32_fma_wide, xf, 8 * n, "f32_fma_x4")
    bench(chain_u32_mul_wide, xu, 8 * n, "u32_mul_x4")

    a8 = jnp.asarray(np.random.RandomState(1).randint(
        0, 127, size=(8192, 48)).astype(np.int32))
    bench(chain_i8_matmul, a8, 2 * 8192 * 48 * 96, "i8_matmul_redc_shape")


if __name__ == "__main__":
    main()
