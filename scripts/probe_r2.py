"""TPU probe 2: the round-2 MSM (split plan + hybrid combine) and the
device prover on BASELINE config #2 (m=16 aggregated 64-bit range proofs).

    python scripts/probe_r2.py [msm|prove|ipa]
"""

import json
import os
import sys
import time

os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")
os.environ.setdefault("BP_BACKEND", "jax")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp
import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_host import G1


def bench(fn, *args, reps=3, name=""):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or \
        isinstance(out, (tuple, list)) else None
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"PROBE {name}: p50={med*1e3:.2f} ms  first={compile_s:.1f} s",
          flush=True)
    return med


def probe_msm():
    N = 1 << 16
    c = 8
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        rnd = random.Random(0xBE7C)
        base = [G1.random(rnd) for _ in range(256)]
        P = ej.to_device_points(base * (N // 256), ctx)
        # scalars UNIFORM mod r (a modulo-biased top limb skews the top
        # window's bucket occupancy 1.5x and blows the static round guess)
        from bulletproofs_tpu.ops import field_jax as fjx
        vals = [rnd.randrange(BLS381.r) for _ in range(N)]
        s = jnp.asarray(fjx.ints_to_limbs(vals, ctx.fr.L))
        rounds = msm_mod.occupancy_guess(N, ctx, c)
        print(f"guess rounds={rounds}", flush=True)

        t_dev = bench(lambda: msm_mod.msm_device(P, s, ctx, c),
                      name="msm_device_split")
        t_hyb = bench(lambda: msm_mod.msm_hybrid(P, s[None], ctx, c),
                      name="msm_hybrid_split")
        print(f"PROBE pts_per_s: device={N/t_dev:.0f} hybrid={N/t_hyb:.0f}",
              flush=True)
        # two-set hybrid (the per-IPA-round shape)
        s2 = jnp.stack([s, jnp.roll(s, 1, axis=1)], axis=0)
        t_hyb2 = bench(lambda: msm_mod.msm_hybrid(P, s2, ctx, c),
                       name="msm_hybrid_2set")


def probe_prove():
    import bulletproofs_tpu as bp
    from bulletproofs_tpu.models import bound_check
    from bulletproofs_tpu.transcript import ProofTranscript
    from bulletproofs_tpu import Prover, Verifier

    m, bits = 16, 64
    n_gens = 2048
    with using_curve(BLS381):
        G = bp.get_generators("G", n_gens)
        H = bp.get_generators("H", n_gens)
        g = bp.G1.from_msg_hash(b"g")
        h = bp.G1.from_msg_hash(b"h")

        def prove_once(seed):
            rng = random.Random(seed)
            vals = [rng.randrange(1 << 63) for _ in range(m)]
            tr = ProofTranscript(b"AggRange")
            p = Prover(g, h, tr, rng=rng)
            comms = []
            t0 = time.time()
            for v in vals:
                comms.append(bound_check.prove_bounded_num(
                    v, None, 0, (1 << bits) - 1, bits, rng, p))
            t_circuit = time.time() - t0
            t0 = time.time()
            proof = p.prove(G, H)
            t_prove = time.time() - t0
            return proof, comms, t_circuit, t_prove

        proof, comms, tc, tp = prove_once(1)
        print(f"PROBE prove_m16 first: circuit={tc:.2f}s prove={tp:.2f}s",
              flush=True)
        times = []
        for seed in (2, 3, 4):
            _, _, tc, tp = prove_once(seed)
            times.append(tp)
            print(f"PROBE prove_m16: circuit={tc:.2f}s prove={tp:.2f}s",
                  flush=True)
        med = sorted(times)[1]

        def verify_once(proof, comms):
            tr = ProofTranscript(b"AggRange")
            v = Verifier(tr)
            t0 = time.time()
            for cm in comms:
                bound_check.verify_bounded_num(
                    0, (1 << bits) - 1, bits, cm, v)
            v.verify(proof, g, h, G, H)
            return time.time() - t0
        tv0 = verify_once(proof, comms)
        tvs = [verify_once(proof, comms) for _ in range(3)]
        print(f"PROBE verify_m16: first={tv0:.2f}s p50={sorted(tvs)[1]:.2f}s",
              flush=True)
        print(json.dumps({"prove_m16_p50_s": med,
                          "verify_m16_p50_s": sorted(tvs)[1]}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "msm"
    if which == "msm":
        probe_msm()
    elif which == "prove":
        probe_prove()
