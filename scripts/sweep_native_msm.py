"""Sweep the native signed/GLV MSM (bp_msm2): window size, GLV on/off,
legacy path — correctness-checked against the exact host backend.

Usage: python scripts/sweep_native_msm.py [n ...]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofs_tpu.config import BLS381, using_curve          # noqa: E402
from bulletproofs_tpu.ops.cpp_backend import CppBackend          # noqa: E402
from bulletproofs_tpu.ops.ec_host import G1, msm_host            # noqa: E402
from bulletproofs_tpu.ops.field_host import Scalar               # noqa: E402


def bench_one(cb, pts, ks, label, check=None, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = cb.msm(pts, ks)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    ok = "" if check is None else ("  OK" if out == check else "  MISMATCH!")
    print(f"  {label:28s} {med*1e3:9.1f} ms{ok}", flush=True)
    return out, med


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4160, 65536]
    rnd = random.Random(0xBE7C)
    cb = CppBackend()
    with using_curve(BLS381):
        base = [G1.random(rnd) for _ in range(256)]
        for n in sizes:
            pts = (base * ((n + 255) // 256))[:n]
            ks = [Scalar.random(rnd) for _ in range(n)]
            print(f"n = {n}", flush=True)
            want = msm_host(pts[:512], ks[:512]) if n <= 512 else None
            ref, _ = bench_one(cb, pts, ks, "bp_msm2 (default)", want)
            os.environ["BP_CPP_LEGACY_MSM"] = "1"
            bench_one(cb, pts, ks, "legacy bp_msm", ref)
            del os.environ["BP_CPP_LEGACY_MSM"]
            os.environ["BP_CPP_GLV"] = "0"
            cb_noglv = CppBackend()
            # _CurveABI caches the glv block per process: bust via fresh ABI
            from bulletproofs_tpu.ops import cpp_backend as m
            m._CurveABI._cache.clear()
            bench_one(cb_noglv, pts, ks, "signed, no GLV", ref)
            del os.environ["BP_CPP_GLV"]
            m._CurveABI._cache.clear()
            for w in (8, 9, 10, 11, 12, 13):
                os.environ["BP_CPP_WINDOW"] = str(w)
                bench_one(cb, pts, ks, f"glv+signed c={w}", ref, reps=1)
            del os.environ["BP_CPP_WINDOW"]


if __name__ == "__main__":
    main()
