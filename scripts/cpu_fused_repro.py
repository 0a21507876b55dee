"""CPU repro of the fused-IPA hardware failure: fused vs per-round byte
equality at sizes the CPU test suite does not cover (n=2048 failed
off-curve on hardware; n=16 is byte-exact both on CPU and hardware).

Usage: python scripts/cpu_fused_repro.py [n ...]   (default: 64 256)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BP_UNROLL", "4")
os.environ.setdefault("BP_CIOS_UNROLL", "1")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu import backend as backend_mod
from bulletproofs_tpu import ipp as ipp_mod


def run(n):
    # save/restore: the repro may be imported or run inside a longer
    # session (ADVICE r4) — don't leak the forced knobs
    prev_fused = os.environ.get("BP_IPA_FUSED")
    prev_min_n = ipp_mod.DEVICE_IPA_MIN_N
    try:
        ipp_mod.DEVICE_IPA_MIN_N = 1
        backend_mod.set_backend("jax")
        rng = random.Random(5)
        G = get_generators("G", n)
        H = get_generators("H", n)
        Q = G1.from_msg_hash(b"Q")
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        Gf = [Scalar.random(rng) for _ in range(n)]
        Hf = [Scalar.random(rng) for _ in range(n)]
        os.environ["BP_IPA_FUSED"] = "1"
        pf = ipp_mod.create_ipp(ProofTranscript(b"cpu"), Q, Gf, Hf,
                                G, H, a, b)
        os.environ["BP_IPA_FUSED"] = "0"
        pp = ipp_mod.create_ipp(ProofTranscript(b"cpu"), Q, Gf, Hf,
                                G, H, a, b)
    finally:
        if prev_fused is None:
            os.environ.pop("BP_IPA_FUSED", None)
        else:
            os.environ["BP_IPA_FUSED"] = prev_fused
        ipp_mod.DEVICE_IPA_MIN_N = prev_min_n
        backend_mod.set_backend("auto")
    ok = ([p.to_bytes() for p in pf.L] == [p.to_bytes() for p in pp.L]
          and [p.to_bytes() for p in pf.R] == [p.to_bytes() for p in pp.R]
          and pf.a.v == pp.a.v and pf.b.v == pp.b.v)
    print(f"cpu fused ipa n={n}: {'OK (byte-identical)' if ok else 'MISMATCH'}",
          flush=True)
    if not ok:
        for j, (x, y) in enumerate(zip(pf.L, pp.L)):
            if x.to_bytes() != y.to_bytes():
                print(f"  first diverging L round: {j}", flush=True)
                break
        else:
            print("  L identical; divergence in R or a/b", flush=True)
    return ok


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [64, 256]
    with using_curve(BLS381):
        for n in sizes:
            run(n)


if __name__ == "__main__":
    main()
