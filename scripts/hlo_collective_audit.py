"""Compiled-HLO collective audit for the sharded MSM (VERDICT r3 task 8).

The virtual-CPU-mesh scaling numbers are serialized by XLA-CPU collective
EMULATION, so the analytic ICI/DCN model in NOTES.md needs its communication
terms backed by COMPILER-reported facts, not estimates.  This script lowers
the production sharded MSM (1-D butterfly and 2-D hierarchical) at
D = 2/4/8, parses the optimized HLO, and reports per-device collective op
counts and payload bytes — the communication side of the model, measured.

Usage: python scripts/hlo_collective_audit.py [n]
Writes a markdown table to stdout (paste into NOTES.md).
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("BP_UNROLL", "4")
os.environ.setdefault("BP_CIOS_UNROLL", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache_cpu")
import jax.numpy as jnp
import numpy as np
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import field_jax as fjx
from bulletproofs_tpu.ops import msm as msm_mod
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.parallel import make_mesh
from bulletproofs_tpu.parallel.sharded_msm import (
    _msm_sharded_2d_jit, _msm_sharded_jit, make_mesh_2d)

_DTYPE_BYTES = {"u8": 1, "s8": 1, "u16": 2, "s16": 2, "u32": 4, "s32": 4,
                "u64": 8, "s64": 8, "f32": 4, "f64": 8, "pred": 1}
_COLLECTIVES = ("collective-permute", "all-reduce", "all-gather",
                "reduce-scatter", "all-to-all")
_SHAPE_RE = re.compile(r"(u8|s8|u16|s16|u32|s32|u64|s64|f32|f64|pred)"
                       r"\[([0-9,]*)\]")


def _payload_bytes(line):
    """Sum the byte sizes of the RESULT shape(s) of an HLO op line: the
    text between '=' and the op name, e.g.
    `%ppermute.3 = u32[3,24,32,256]{...} collective-permute(...)`."""
    rhs = line.split("=", 1)[1]
    result = rhs.split("(", 1)[0]       # shapes + op name, no operands
    total = 0
    for dt, dims in _SHAPE_RE.findall(result):
        elems = 1
        for d in dims.split(","):
            if d:
                elems *= int(d)
        total += elems * _DTYPE_BYTES[dt]
    return total


def audit(hlo_text):
    """-> {op_kind: (count, total_payload_bytes)} over the optimized HLO."""
    out = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        if "=" not in ls:
            continue
        for coll in _COLLECTIVES:
            if f" {coll}(" in ls:
                cnt, byts = out.get(coll, (0, 0))
                out[coll] = (cnt + 1, byts + _payload_bytes(ls))
                break
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    c = 8
    rng = random.Random(7)
    rows = []
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        base = [G1.random(rng) for _ in range(min(n, 256))]
        pts = (base * (n // len(base) + 1))[:n]
        vals = [rng.randrange(BLS381.r) for _ in range(n)]
        P = ej.to_device_points(pts, ctx)
        s = jnp.asarray(fjx.ints_to_limbs(vals, ctx.fr.L))
        rounds = msm_mod.occupancy_guess(n, ctx, c, dup=False)

        cases = []
        for d in (2, 4, 8):
            cases.append((f"1-D D={d}", _msm_sharded_jit,
                          make_mesh(jax.devices()[:d])))
        for hosts, chips in ((2, 4), (4, 2)):
            cases.append((f"2-D {hosts}x{chips}", _msm_sharded_2d_jit,
                          make_mesh_2d(hosts, chips)))

        for label, fn, mesh in cases:
            lowered = fn.lower(P, s, ctx, c, mesh, rounds)
            hlo = lowered.compile().as_text()
            stats = audit(hlo)
            d = mesh.devices.size
            for kind, (cnt, byts) in sorted(stats.items()):
                rows.append((label, d, kind, cnt, byts))

    print(f"\nCollective audit (n={n}, c={c}, rounds={rounds}, "
          "optimized HLO, per-device program):\n")
    print("| mesh | devices | collective | ops | payload bytes |")
    print("|---|---|---|---|---|")
    for label, d, kind, cnt, byts in rows:
        print(f"| {label} | {d} | {kind} | {cnt} | {byts:,} |")
    print("\nNotes: payload = result-shape bytes per op instance per device"
          " (butterfly stages move the full bucket array each exchange);"
          " multiply by ops for total per-device traffic per MSM.")


if __name__ == "__main__":
    main()
