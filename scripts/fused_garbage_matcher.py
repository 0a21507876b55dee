"""Offline matcher for the fused-IPA hardware garbage bytes.

The corrupted round-0 L bytes are DETERMINISTIC and invariant under three
structurally different combine implementations (NOTES.md round-5 ledger),
so the combine is faithfully processing an already-corrupt input.  This
script computes, on the host, what L would be under a catalogue of
plausible stage-failure models (dup rows dropped, split buckets unfolded,
round truncation, set mixing, ...) for the exact race inputs
(scripts/race_fused_ipa.py ipa2048 seeds), and matches each candidate's
serialized prefix against the leaked garbage prefix — identifying the
corrupted stage without a single hardware compile.

Usage: python scripts/fused_garbage_matcher.py [garbage_hex_prefix]
  default prefix: 04140935118c312f664c (race round-5 attempts 2 AND 3)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import random

import jax
jax.config.update("jax_platforms", "cpu")

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import get_generators
from bulletproofs_tpu.ops.cpp_backend import CppBackend


def emulate_schedule(digits_row, rng_w, spl_w):
    """numpy replica of _slot_grid's per-row schedule: returns arrays
    (rank, rnd, bucket) per point position (digit 0 -> rank -1)."""
    n = digits_row.shape[0]
    order = np.argsort(digits_row, kind="stable")
    sd = digits_row[order]
    rank = np.full(n, -1, np.int64)
    rnd = np.full(n, -1, np.int64)
    bucket = np.full(n, -1, np.int64)
    run_start = 0
    for pos in range(n):
        if pos and sd[pos] != sd[pos - 1]:
            run_start = pos
        d = int(sd[pos])
        if d == 0:
            continue
        rk = pos - run_start
        rank[order[pos]] = rk
        bucket[order[pos]] = d + rng_w * (rk % spl_w)
        rnd[order[pos]] = rk // spl_w
    return rank, rnd, bucket


def main():
    want_prefix = (sys.argv[1] if len(sys.argv) > 1
                   else "04140935118c312f664c")
    n = 2048
    c = 8
    with using_curve(BLS381):
        r = BLS381.r
        rng = random.Random(3)
        G = get_generators("G", n)
        H = get_generators("H", n)
        Q = G1.from_msg_hash(b"Q")
        a = [Scalar.random(rng).v for _ in range(n)]
        b = [Scalar.random(rng).v for _ in range(n)]
        half = n // 2
        cL = sum(a[i] * b[i + half] for i in range(half)) % r
        cR = sum(a[i + half] * b[i] for i in range(half)) % r
        # round-0 scalar sets over [G | H | Q | identity] (Gf = Hf = 1)
        want_L = [0] * half + a[:half] + b[half:] + [0] * half + [cL, 0]
        want_R = a[half:] + [0] * half + [0] * half + b[:half] + [cR, 0]
        table = G + H + [Q] + [G1.identity()]
        nn = len(table)                               # 2n + 2

        n_bits = BLS381.fr.n_bits
        W = -(-n_bits // c)                           # 32
        B = 1 << c

        # window_plan replica (msm.py:86-142), n_sets=2, dup on
        ranges, splits = [], []
        for w in range(W):
            rg = min(B, ((r - 1) >> (c * w)) + 1)
            sp = 1
            while sp * 2 * rg <= B:
                sp *= 2
            ranges.append(rg)
            splits.append(sp)
        dup_plan = []
        for s in range(2):
            for w in range(W):
                ratio = B / (ranges[w] * splits[w])
                if ratio > 1.04:
                    dup_plan.append((s * W + w, int(np.ceil(ratio))))

        # per-(set, window) digit rows + dup spreading, then schedules
        vals = np.zeros((2, nn), object)
        vals[0, :] = want_L
        vals[1, :] = want_R
        rows = []                                     # (set, w, digits)
        for s in range(2):
            for w in range(W):
                d = np.array([(int(v) >> (c * w)) & (B - 1)
                              for v in vals[s]], np.int64)
                rows.append([s, w, d])
        iota = np.arange(nn)
        extras = []
        for src, g in dup_plan:
            grp = iota % g
            src_d = rows[src][2]
            rows[src][2] = np.where(grp == 0, src_d, 0)
            for j in range(1, g):
                extras.append([rows[src][0], rows[src][1],
                               np.where(grp == j, src_d, 0)])
        all_rows = rows + extras                      # dup rows appended
        sched = []
        for s, w, d in all_rows:
            rk, rd, bk = emulate_schedule(d, ranges[w], splits[w])
            sched.append((s, w, d, rk, rd, bk))
        occ = max(int(rd.max()) + 1 for *_x, rd, _b in
                  [(s, w, d, rk, rd, bk) for s, w, d, rk, rd, bk in sched])
        print(f"emulated occupancy: {occ} (hw reported 24)")

        cb = CppBackend()

        def msm_of(eff):
            return cb.msm(table, [Scalar(int(v) % r) for v in eff])

        correct_L = msm_of(want_L)
        correct_R = msm_of(want_R)
        assert correct_L.to_bytes().hex().startswith("04")

        def cand(name, eff_L):
            got = msm_of(eff_L).to_bytes().hex()
            hit = got.startswith(want_prefix.lower())
            print(f"{'  MATCH -> ' if hit else '          '}{name}: "
                  f"{got[:20]}", flush=True)
            return hit

        print(f"garbage prefix: {want_prefix}")
        print(f"correct L:      {correct_L.to_bytes().hex()[:20]}")
        print(f"correct R:      {correct_R.to_bytes().hex()[:20]}")

        hits = []
        # V6: L slot actually carries R
        if correct_R.to_bytes().hex().startswith(want_prefix.lower()):
            hits.append("L==correct R (sets swapped)")
            print("  MATCH -> sets swapped (L==R)")

        # V15: L = L + R (sets merged)
        hits += ["sets merged"] if cand(
            "sets merged (L+R)",
            [(x + y) % r for x, y in zip(want_L, want_R)]) else []
        # V16: L doubled
        hits += ["L doubled"] if cand(
            "L doubled", [2 * x % r for x in want_L]) else []
        # V10: Q lane dropped
        effQ = list(want_L)
        effQ[2 * n] = 0
        hits += ["Q lane dropped"] if cand("Q lane (c_L) dropped",
                                           effQ) else []

        # stage-failure models over the schedule (set 0 rows only)
        def eff_minus(drop_fn, name):
            eff = [int(v) for v in want_L]
            for s, w, d, rk, rd, bk in sched:
                if s != 0:
                    continue
                for i in range(nn):
                    if d[i] and drop_fn(w, int(d[i]), int(rk[i]),
                                        int(rd[i]), int(bk[i])):
                        eff[i] -= int(d[i]) << (c * w)
            return cand(name, eff)

        # V1: dup extra rows dropped (their points vanish)
        eff = [int(v) for v in want_L]
        for (s, w, d, rk, rd, bk) in sched[len(rows):]:   # extras only
            if s == 0:
                for i in range(nn):
                    if d[i]:
                        eff[i] -= int(d[i]) << (c * w)
        hits += ["dup rows dropped"] if cand("dup extra rows dropped",
                                             eff) else []

        # V3: split buckets unfolded (weight = spread bucket index)
        eff = [int(v) for v in want_L]
        for s, w, d, rk, rd, bk in sched:
            if s != 0:
                continue
            for i in range(nn):
                if d[i] and bk[i] != d[i]:
                    eff[i] += (int(bk[i]) - int(d[i])) << (c * w)
        hits += ["split unfolded"] if cand("split buckets unfolded",
                                           eff) else []

        # V4: rounds truncated at 16 / 8 / 1 (chunk boundary failures)
        for Rcut in (16, 8, 4, 1):
            if eff_minus(lambda w, d, rk, rd, bk, R=Rcut: rd >= R,
                         f"rounds >= {Rcut} dropped"):
                hits.append(f"rounds>= {Rcut} dropped")

        # V9: top window dropped entirely
        if eff_minus(lambda w, d, rk, rd, bk: w == W - 1,
                     "top window dropped"):
            hits.append("top window dropped")

        # V18: only the FIRST point of each bucket kept (found-mask gives
        # one slot per (round, bucket); rank collisions dropped) — rank
        # within (bucket, round) > 0 dropped is the grid's job; emulate
        # 'last write wins' instead: keep only the LAST point per slot
        # (scatter semantics instead of slot grid)
        eff = [int(v) for v in want_L]
        slot_last = {}
        for s, w, d, rk, rd, bk in sched:
            if s != 0:
                continue
            for i in range(nn):
                if d[i]:
                    slot_last[(w, int(rd[i]), int(bk[i]))] = i
        keep = set()
        for (w, rd_, bk_), i in slot_last.items():
            keep.add((w, i))
        eff = [0] * nn
        for s, w, d, rk, rd, bk in sched:
            if s != 0:
                continue
            for i in range(nn):
                if d[i] and (w, i) in keep:
                    eff[i] += int(d[i]) << (c * w)
        hits += ["scatter last-wins"] if cand(
            "scatter last-write-wins", eff) else []

        print()
        if hits:
            print("MATCHED MODELS:", hits)
        else:
            print("no candidate matched — corruption is not one of the "
                  "modeled stage failures (or affects serialization).")


if __name__ == "__main__":
    main()
