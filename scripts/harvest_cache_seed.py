"""Harvest the persistent TPU compile cache into the repo's cache_seed/.

The driver's end-of-round bench runs on a FRESH machine image: every MSM /
fused-IPA shape cold-compiles through the axon tunnel at ~3-12 min/shape,
which ate the round-3 and round-4 bench budgets (BENCH_r0{3,4}.json rc=124).
bench.py therefore pre-seeds /root/.jax_cache from cache_seed/*.gz before
its first device section; this script creates those seeds from a warm cache
(run it AFTER a full `python bench.py` pass on real hardware, with NO
kernel-file edits in between).

TPU-target entries only: never harvest /root/.jax_cache_cpu (mixed-target
AOT entries segfault the loader, CLAUDE.md).

Usage: python scripts/harvest_cache_seed.py [--min-bytes 65536] [--prune]
  --prune removes seeds whose cache entry no longer exists (stale keys
  after a kernel edit).
"""

import argparse
import gzip
import os
import sys

CACHE_DIR = "/root/.jax_cache"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED_DIR = os.path.join(REPO, "cache_seed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bytes", type=int, default=65536,
                    help="skip cache entries smaller than this (cheap "
                         "recompiles aren't worth repo bytes)")
    ap.add_argument("--prune", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(CACHE_DIR):
        sys.exit(f"{CACHE_DIR} does not exist — run a TPU workload first")
    os.makedirs(SEED_DIR, exist_ok=True)

    live = set()
    n_new = n_skip = 0
    total = 0
    for fn in sorted(os.listdir(CACHE_DIR)):
        src = os.path.join(CACHE_DIR, fn)
        if not os.path.isfile(src):
            continue
        sz = os.path.getsize(src)
        if sz < args.min_bytes:
            n_skip += 1
            continue
        live.add(fn + ".gz")
        dst = os.path.join(SEED_DIR, fn + ".gz")
        if os.path.exists(dst):
            continue
        with open(src, "rb") as f:
            data = f.read()
        tmp = dst + ".tmp"
        with gzip.open(tmp, "wb", compresslevel=9) as f:
            f.write(data)
        os.replace(tmp, dst)
        n_new += 1
        total += os.path.getsize(dst)
        print(f"  + {fn}  {sz/1e6:.1f} MB -> {os.path.getsize(dst)/1e6:.1f} "
              f"MB gz", flush=True)

    if args.prune:
        for fn in sorted(os.listdir(SEED_DIR)):
            if fn.endswith(".gz") and fn not in live:
                os.unlink(os.path.join(SEED_DIR, fn))
                print(f"  - pruned stale {fn}", flush=True)

    seed_total = sum(os.path.getsize(os.path.join(SEED_DIR, f))
                     for f in os.listdir(SEED_DIR) if f.endswith(".gz"))
    print(f"harvest: +{n_new} entries ({total/1e6:.1f} MB), "
          f"{n_skip} small skipped; cache_seed/ total "
          f"{seed_total/1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
