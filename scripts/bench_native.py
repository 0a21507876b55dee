"""Microbenchmarks for the native (C++/IFMA) layer: fold ladders, 4-term
fold, MSM at protocol sizes, keccak-f[1600], and the mod-r round helpers.

Usage: python scripts/bench_native.py [curve]
All timings are pure-C (buffers prebuilt; marshalling excluded) except the
end-to-end rows.  Compare against NOTES.md "Round-3 host-path overhaul".
"""

import ctypes
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bulletproofs_tpu.config import CURVES, using_curve          # noqa: E402
from bulletproofs_tpu.ops.cpp_backend import (                   # noqa: E402
    CppBackend, _ptr, get_lib)
from bulletproofs_tpu.ops.ec_host import G1                      # noqa: E402
from bulletproofs_tpu.ops.field_host import Scalar               # noqa: E402


def p50(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    cname = sys.argv[1] if len(sys.argv) > 1 else "bls381"
    rng = random.Random(7)
    cpp = CppBackend()
    lib = get_lib()
    with using_curve(CURVES[cname]):
        n = 1024
        pts = [G1.from_msg_hash(b"p%d" % i) for i in range(2 * n)]
        ks = [Scalar.random(rng) for _ in range(2 * n)]
        abi = cpp._abi(pts)
        Lp3 = 3 * abi.Lp
        blk = abi.glv_block()
        pbuf = abi.points_to_buf(pts)
        sbuf = abi.scalars_to_buf(ks)
        out = np.zeros(2 * n * Lp3, dtype=np.uint64)

        # 2-term fold (bp_fold2, the IPA base fold)
        t = p50(lambda: lib.bp_fold2(
            _ptr(abi.params), _ptr(blk), _ptr(pbuf), _ptr(pbuf[n * Lp3:]),
            _ptr(sbuf), _ptr(sbuf[n * abi.Lr:]), ctypes.c_uint64(n),
            _ptr(out)))
        print(f"{cname} fold2      : {t / n * 1e6:7.1f} us/output (n={n})")

        # 4-term fold (bp_fold4, the paired-round combined fold)
        n4 = n // 2
        t = p50(lambda: lib.bp_fold4(
            _ptr(abi.params), _ptr(pbuf), _ptr(pbuf[n4 * Lp3:]),
            _ptr(pbuf[2 * n4 * Lp3:]), _ptr(pbuf[3 * n4 * Lp3:]),
            _ptr(sbuf), _ptr(sbuf[n4 * abi.Lr:]),
            _ptr(sbuf[2 * n4 * abi.Lr:]), _ptr(sbuf[3 * n4 * abi.Lr:]),
            ctypes.c_uint64(n4), _ptr(out)))
        print(f"{cname} fold4      : {t / n4 * 1e6:7.1f} us/output (n={n4})")

        # MSM at protocol sizes (pure C)
        for nn in (2048, 4160, 16384):
            pts2 = [G1.from_msg_hash(b"m%d" % i) for i in range(nn)]
            ks2 = [Scalar.random(rng) for _ in range(nn)]
            pb = abi.points_to_buf(pts2)
            sb = abi.scalars_to_buf(ks2)
            t = p50(lambda: lib.bp_msm2(
                _ptr(abi.params), _ptr(blk), _ptr(pb), _ptr(sb),
                ctypes.c_uint64(nn), _ptr(out)))
            print(f"{cname} msm n={nn:<6}: {t * 1000:7.1f} ms "
                  f"({nn / t / 1000:.0f}k pts/s)")

        # keccak-f[1600]
        st = (ctypes.c_uint64 * 25)()
        lib.bp_keccak_f1600.restype = None
        t0 = time.perf_counter()
        for _ in range(100000):
            lib.bp_keccak_f1600(st)
        t = (time.perf_counter() - t0) / 100000
        print(f"{cname} keccak-f   : {t * 1e9:7.0f} ns/permutation")


if __name__ == "__main__":
    main()
