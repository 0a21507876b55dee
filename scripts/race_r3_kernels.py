"""Round-3 TPU race: one pass over the kernel matrix once the axon tunnel
is back.

Measures (warm p50, persistent compile cache):
  1. production MSM n=2^16 (auto = chunked pallas + mixed-add on affine
     tables) — headline, target <= 0.18 s
  2. same MSM with BP_EC_KERNEL variants for the A/B table:
     pallas (chunk, general rows), pallas_round (per-round), xla
  3. chunked+mixed vs chunked+general (affine flag off)
  4. config #2 device prove p50 (BP_BACKEND=jax)
  5. config #3 standalone IPA n=2^16 verify p50

Usage: python scripts/race_r3_kernels.py [stage...]
  stages: msm ab prove ipa   (default: msm ab)
Run stages separately — each cold compile through the tunnel takes
minutes and the tunnel sometimes drops long compiles (retry once).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fjx
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_host import G1

N = 1 << 16
C = 8


def p50(f, reps=5):
    f()                                   # warm (compile)
    ts = sorted(_timed(f) for _ in range(reps))
    return ts[len(ts) // 2], ts[0]


def _timed(f):
    t0 = time.time()
    f()
    return time.time() - t0


def main():
    stages = sys.argv[1:] or ["msm", "ab"]
    rnd = random.Random(0xBE7C)
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rnd) for _ in range(256)]
        pts = base * (N // 256)
        vals = [rnd.randrange(BLS381.r) for _ in range(N)]
        P, affine = ej.to_device_points_affine(pts, ctx)
        assert affine
        s = jnp.asarray(fjx.ints_to_limbs(vals, ctx.fr.L))

        def run_msm(aff):
            return msm_mod.msm_hybrid(P, s[None], ctx, C, affine=aff)

        if "msm" in stages:
            med, mn = p50(lambda: run_msm(True))
            print(f"[msm]  auto (chunk+mixed): p50 {med:.4f}s  min {mn:.4f}"
                  f"  = {N/med/1000:.0f}k pts/s", flush=True)

        if "ab" in stages:
            med, mn = p50(lambda: run_msm(False))
            print(f"[ab]   chunk general rows: p50 {med:.4f}s min {mn:.4f}",
                  flush=True)
            for variant in ("pallas_round", "xla"):
                os.environ["BP_EC_KERNEL"] = variant
                try:
                    med, mn = p50(lambda: run_msm(False))
                    print(f"[ab]   {variant:13s}: p50 {med:.4f}s "
                          f"min {mn:.4f}", flush=True)
                finally:
                    del os.environ["BP_EC_KERNEL"]

        if "prove" in stages:
            import bulletproofs_tpu as bp
            from bulletproofs_tpu import backend as backend_mod
            from bulletproofs_tpu.models import bound_check
            from bulletproofs_tpu.transcript import ProofTranscript
            from bulletproofs_tpu.utils import get_generators
            G2 = get_generators("G", 2048)
            H2 = get_generators("H", 2048)
            g1 = G1.from_msg_hash(b"g")
            h1 = G1.from_msg_hash(b"h")
            backend_mod.set_backend("jax")

            def prove_once(seed):
                rng = random.Random(seed)
                vs = [rng.randrange(1 << 63) for _ in range(16)]
                tr = ProofTranscript(b"AggRange")
                p = bp.Prover(g1, h1, tr, rng=rng)
                for v in vs:
                    bound_check.prove_bounded_num(
                        v, None, 0, (1 << 64) - 1, 64, rng, p)
                t0 = time.time()
                p.prove(G2, H2)
                return time.time() - t0

            prove_once(1)
            ts = sorted(prove_once(sd) for sd in range(2, 7))
            print(f"[prove] config#2 device prove p50 {ts[2]:.3f}s "
                  f"min {ts[0]:.3f}", flush=True)
            backend_mod.set_backend("auto")

        if "ipa" in stages:
            from bulletproofs_tpu import backend as backend_mod
            from bulletproofs_tpu import ipp as ipp_mod
            from bulletproofs_tpu.ops.field_host import (Scalar,
                                                         inner_product)
            from bulletproofs_tpu.transcript import ProofTranscript
            from bulletproofs_tpu.utils import get_generators
            backend_mod.set_backend("jax")
            G3 = get_generators("G", N)
            H3 = get_generators("H", N)
            Q3 = G1.from_msg_hash(b"Q")
            one = Scalar.one()
            rnd3 = random.Random(3)
            a3 = [Scalar.random(rnd3) for _ in range(N)]
            b3 = [Scalar.random(rnd3) for _ in range(N)]
            Gf = [one] * N
            Hf = [one] * N
            t0 = time.time()
            pr = ipp_mod.create_ipp(ProofTranscript(b"ipa16"), Q3, Gf, Hf,
                                    G3, H3, a3, b3)
            print(f"[ipa]  prove first {time.time()-t0:.1f}s", flush=True)
            ts = sorted(_timed(lambda: ipp_mod.create_ipp(
                ProofTranscript(b"ipa16"), Q3, Gf, Hf, G3, H3, a3, b3))
                for _ in range(3))
            print(f"[ipa]  prove p50 {ts[1]:.2f}s", flush=True)

            P3 = msm_mod.msm_hybrid(
                jnp.concatenate([ej.to_device_points(G3, ctx),
                                 ej.to_device_points(H3, ctx),
                                 ej.to_device_points([Q3], ctx)], axis=2),
                ej.to_device_scalars(a3 + b3 + [inner_product(a3, b3)],
                                     ctx)[None], ctx)[0]

            def vf():
                ipp_mod.verify_ipp(N, ProofTranscript(b"ipa16"), Gf, Hf,
                                   P3, Q3, G3, H3, pr.a, pr.b, pr.L, pr.R)
            med, mn = p50(vf, reps=3)
            print(f"[ipa]  verify p50 {med:.3f}s min {mn:.3f}", flush=True)
            backend_mod.set_backend("auto")


if __name__ == "__main__":
    main()
