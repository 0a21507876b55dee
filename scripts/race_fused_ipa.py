"""Race the FUSED device IPA (one dispatch for all rounds + device
transcript) against the per-round device path and the native host path on
real TPU hardware (VERDICT r3 tasks 2/9).

Stages (run separately — tunnel drops long compiles; each stage's first
call cold-compiles and persists to /root/.jax_cache):

  python scripts/race_fused_ipa.py ipa2048      # config #2 IPA shape
  python scripts/race_fused_ipa.py ipa65536     # config #3 standalone IPA
  python scripts/race_fused_ipa.py prove2       # full config #2 prove A/B
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
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu import backend as backend_mod


def _p50(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def run_ipa(n, reps=3):
    from bulletproofs_tpu import ipp as ipp_mod
    ipp_mod.DEVICE_IPA_MIN_N = 1
    backend_mod.set_backend("jax")
    rng = random.Random(3)
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    one = Scalar.one()
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    Gf = [one] * n
    Hf = [one] * n

    proofs = {}
    for mode in ("1", "0"):
        os.environ["BP_IPA_FUSED"] = mode
        label = "fused" if mode == "1" else "per-round"
        t0 = time.time()
        proof = ipp_mod.create_ipp(
            ProofTranscript(b"race"), Q, Gf, Hf, G, H, a, b)
        print(f"ipa n={n} {label:9s} first(+compile): "
              f"{time.time()-t0:.2f}s", flush=True)
        p50 = _p50(lambda: ipp_mod.create_ipp(
            ProofTranscript(b"race"), Q, Gf, Hf, G, H, a, b), reps)
        print(f"ipa n={n} {label:9s} warm p50: {p50:.3f}s", flush=True)
        proofs[label] = proof
    os.environ.pop("BP_IPA_FUSED", None)
    pf, pp = proofs["fused"], proofs["per-round"]
    ok = ([p.to_bytes() for p in pf.L] == [p.to_bytes() for p in pp.L]
          and [p.to_bytes() for p in pf.R] == [p.to_bytes() for p in pp.R]
          and pf.a.v == pp.a.v and pf.b.v == pp.b.v)
    print(f"ipa n={n} fused vs per-round bytes: "
          f"{'IDENTICAL' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        raise SystemExit(1)


def run_prove2():
    from bulletproofs_tpu import Prover
    from bulletproofs_tpu.models import bound_check
    g1 = G1.from_msg_hash(b"g")
    h1 = G1.from_msg_hash(b"h")
    G2 = get_generators("G", 2048)
    H2 = get_generators("H", 2048)
    m, bits = 16, 64

    def prove_once(seed):
        rng = random.Random(seed)
        vals = [rng.randrange(1 << 63) for _ in range(m)]
        tr = ProofTranscript(b"AggRange")
        p = Prover(g1, h1, tr, rng=rng)
        for v in vals:
            bound_check.prove_bounded_num(
                v, None, 0, (1 << bits) - 1, bits, rng, p)
        t0 = time.time()
        proof = p.prove(G2, H2)
        return proof.to_bytes(), time.time() - t0

    refs = {}
    for be, mode, label in (("jax", "1", "device+fused"),
                            ("jax", "0", "device per-round"),
                            ("auto", "1", "auto(native host)")):
        backend_mod.set_backend(be)
        os.environ["BP_IPA_FUSED"] = mode
        pb, warm = prove_once(1)
        print(f"config2 {label:17s} first(+compile): {warm:.2f}s",
              flush=True)
        ts = []
        for seed in (2, 3, 4):
            pb, tp = prove_once(seed)
            refs.setdefault(seed, pb)
            assert refs[seed] == pb, f"proof bytes diverge ({label})"
            ts.append(tp)
        print(f"config2 {label:17s} warm p50: {sorted(ts)[1]:.3f}s",
              flush=True)
    os.environ.pop("BP_IPA_FUSED", None)
    backend_mod.set_backend("auto")
    print("proof bytes identical across all three paths")


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "ipa2048"
    with using_curve(BLS381):
        if stage == "ipa2048":
            run_ipa(2048)
        elif stage == "ipa65536":
            run_ipa(1 << 16)
        elif stage == "prove2":
            run_prove2()
        else:
            sys.exit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
