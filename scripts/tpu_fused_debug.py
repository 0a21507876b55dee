"""Stage-by-stage hardware check of the fused-IPA building blocks on the
real TPU (the fused program compiled but produced off-curve L/R bytes while
the CPU path is byte-identical — isolate which primitive diverges on
hardware).

Usage: python scripts/tpu_fused_debug.py [stage...]
Stages: keccak strobe serialize reduce ipa16
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BP_UNROLL", "64")
os.environ.setdefault("BP_CIOS_UNROLL", "8")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
import random

from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import transcript_device as td
from bulletproofs_tpu.ops.keccak_jax import keccak_f1600_device
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript
from bulletproofs_tpu.transcript.keccak import keccak_f1600


def stage_keccak():
    rng = random.Random(1)
    raw = bytes(rng.randrange(256) for _ in range(200))
    host = bytearray(raw)
    keccak_f1600(host)
    dev = jax.jit(keccak_f1600_device)(
        jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.uint32)))
    ok = bytes(np.asarray(dev).astype(np.uint8)) == bytes(host)
    print(f"keccak: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def stage_serialize(ctx):
    rng = random.Random(2)
    pts = [G1.random(rng) for _ in range(5)] + [G1.identity()]
    pts[1] = pts[1] + pts[2]
    dev = ej.to_device_points(pts, ctx)
    got = np.asarray(jax.jit(lambda p: td.serialize_points(p, ctx))(dev))
    ok = all(bytes(got[i].astype(np.uint8)) == pt.to_bytes()
             for i, pt in enumerate(pts))
    print(f"serialize_points: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        for i, pt in enumerate(pts):
            g = bytes(got[i].astype(np.uint8))
            if g != pt.to_bytes():
                print(f"  idx {i}: got  {g.hex()[:64]}...")
                print(f"         want {pt.to_bytes().hex()[:64]}...")
    return ok


def stage_reduce(ctx):
    rng = random.Random(3)
    ok = True
    for _ in range(4):
        raw = bytes(rng.randrange(256) for _ in range(BLS381.modbytes))
        want = Scalar.from_bytes(raw).v
        arr = jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.uint32))
        got = ctx.fr.from_mont(
            jax.jit(lambda b: td.reduce_bytes_mod_r(b, ctx))(arr))[0]
        if got != want:
            ok = False
            print(f"  reduce mismatch: got {got:#x} want {want:#x}")
    print(f"reduce_bytes_mod_r: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def stage_strobe(ctx):
    rng = random.Random(4)
    host = ProofTranscript(b"hwdbg")
    host.innerproduct_domain_sep(64)
    pts = [G1.random(rng) for _ in range(8)]
    dev_pts = ej.to_device_points(pts, ctx)
    snap, pos, pb, fl = td.DeviceTranscript.snapshot(host)

    def run(state, P):
        t = td.DeviceTranscript.from_snapshot(state, pos, pb, fl)
        chals = []
        pbytes = td.serialize_points(P, ctx)
        for j in range(4):
            t.commit_point_bytes(b"L", pbytes[2 * j])
            t.commit_point_bytes(b"R", pbytes[2 * j + 1])
            chals.append(t.challenge_scalar_mont(b"u", ctx))
        return t.strobe.st, jnp.concatenate(chals, axis=1)

    final_dev, chals_m = jax.jit(run)(jnp.asarray(snap), dev_pts)
    got = ctx.fr.from_mont(chals_m)
    want = []
    for j in range(4):
        host.commit_point(b"L", pts[2 * j])
        host.commit_point(b"R", pts[2 * j + 1])
        want.append(host.challenge_scalar(b"u").v)
    ok = got == want and \
        bytes(np.asarray(final_dev).astype(np.uint8)) == \
        bytes(host.strobe.state)
    print(f"strobe schedule: {'OK' if ok else 'MISMATCH'}", flush=True)
    if got != want:
        print(f"  first chal got  {got[0]:#x}")
        print(f"  first chal want {want[0]:#x}")
    return ok


def stage_combine(ctx, n=4098):
    """Two-set MSM with the pure-DEVICE combine (the fused path's tail:
    bucket_rowcol + combine_from_rowcol) vs the host-combine hybrid path
    (hardware-proven, round 3) at the config-2 IPA shape (c = 8, split +
    dup windows active).  Isolates the device combine from the fused
    loop/transcript."""
    from bulletproofs_tpu.ops import msm as msm_mod
    from bulletproofs_tpu.ops import field_jax as fj
    rng = random.Random(7)
    pts = [G1.random(rng) for _ in range(n)]
    dev = ej.to_device_points(pts, ctx)
    scal = [[Scalar.random(rng) for _ in range(n)] for _ in range(2)]
    sc = jnp.stack([jnp.asarray(fj.ints_to_limbs([s.v for s in row],
                                                 ctx.fr.L))
                    for row in scal], axis=0)
    c = msm_mod.pick_window(n)
    rounds = msm_mod.occupancy_guess(n, ctx, c)
    while True:
        out, occ = msm_mod._msm_multi_device_jit(dev, sc, ctx, c, rounds)
        out, occ = jax.device_get((out, occ))
        if int(occ) <= rounds:
            break
        rounds = (int(occ) + 15) // 16 * 16
    got = ej.from_device_points(jnp.asarray(out), ctx)
    want = msm_mod.msm_hybrid(dev, sc, ctx, c=c)
    ok = all(g.to_bytes() == w.to_bytes() for g, w in zip(got, want))
    print(f"device combine n={n} c={c}: {'OK' if ok else 'MISMATCH'}",
          flush=True)
    if not ok:
        for i, (g, w) in enumerate(zip(got, want)):
            if g.to_bytes() != w.to_bytes():
                print(f"  set {i}: got  {g.to_bytes().hex()[:48]}...")
                print(f"         want {w.to_bytes().hex()[:48]}...")
    return ok


def stage_ipa16(n=16):
    from bulletproofs_tpu import ipp as ipp_mod, backend as backend_mod
    from bulletproofs_tpu.utils import get_generators
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
    pf = ipp_mod.create_ipp(ProofTranscript(b"hw16"), Q, Gf, Hf, G, H, a, b)
    os.environ["BP_IPA_FUSED"] = "0"
    pp = ipp_mod.create_ipp(ProofTranscript(b"hw16"), Q, Gf, Hf, G, H, a, b)
    os.environ.pop("BP_IPA_FUSED", None)
    ok = ([p.to_bytes() for p in pf.L] == [p.to_bytes() for p in pp.L]
          and pf.a.v == pp.a.v and pf.b.v == pp.b.v)
    print(f"fused ipa n={n}: {'OK (byte-identical)' if ok else 'MISMATCH'}",
          flush=True)
    if not ok:
        for j, (x, y) in enumerate(zip(pf.L, pp.L)):
            if x.to_bytes() != y.to_bytes():
                print(f"  first diverging round: {j}")
                break
    return ok


def main():
    stages = sys.argv[1:] or ["keccak", "serialize", "reduce", "strobe",
                              "ipa16"]
    with using_curve(BLS381):
        ctx = ej.CurveCtx(BLS381)
        for s in stages:
            if s == "keccak":
                stage_keccak()
            elif s == "serialize":
                stage_serialize(ctx)
            elif s == "reduce":
                stage_reduce(ctx)
            elif s == "strobe":
                stage_strobe(ctx)
            elif s.startswith("ipa"):
                stage_ipa16(int(s[3:] or 16))
            elif s.startswith("combine"):
                stage_combine(ctx, int(s[7:] or 4098))


if __name__ == "__main__":
    main()
