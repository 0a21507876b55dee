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


def stage_mixed(ctx, n=2048):
    """Mixed-add vs general chunked bucket kernel at the fused round-0
    shape: affine table [G | H | Q | identity], two scalar sets with the
    identity lane pinned to zero, via the production msm_hybrid (host
    combine).  Host native MSM is the reference."""
    from bulletproofs_tpu.ops import msm as msm_mod
    from bulletproofs_tpu.ops import field_jax as fj
    from bulletproofs_tpu.ops.ec_host import msm_host
    from bulletproofs_tpu.utils import get_generators
    rng = random.Random(11)
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    table = G + H + [Q]
    dev, aff = ej.to_device_points_affine(table, ctx)
    dev = jnp.concatenate([dev, jnp.asarray(ctx.identity)], axis=2)
    assert aff, "generator table should be affine"
    m = 2 * n + 2
    scal = [[Scalar.random(rng) for _ in range(m - 1)] + [Scalar(0)]
            for _ in range(2)]
    sc = jnp.stack([jnp.asarray(fj.ints_to_limbs([s.v for s in row],
                                                 ctx.fr.L))
                    for row in scal], axis=0)
    want = [msm_host(table, row[:-1]) for row in scal]
    c = msm_mod.pick_window(m)
    for affine, label in ((True, "mixed"), (False, "general")):
        got = msm_mod.msm_hybrid(dev, sc, ctx, c=c, affine=affine)
        ok = all(g.to_bytes() == w.to_bytes() for g, w in zip(got, want))
        print(f"msm_hybrid n={m} c={c} {label:8s}: "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            for i, (g, w) in enumerate(zip(got, want)):
                if g.to_bytes() != w.to_bytes():
                    print(f"  set {i}: got  {g.to_bytes().hex()[:48]}...")
                    print(f"         want {w.to_bytes().hex()[:48]}...")


def stage_round0(ctx, n=2048):
    """Piecewise hardware replay of the fused IPA's ROUND 0 (the round the
    n=2048 run corrupts): (a) traced-index scalar build vs the static
    builder, (b) the two-set mixed-kernel MSM with the pure-device combine
    on those exact scalars vs the host MSM, (c) device serialization of the
    results vs host to_bytes."""
    from bulletproofs_tpu.ops import prover_device as pd
    from bulletproofs_tpu.ops import msm as msm_mod
    from bulletproofs_tpu.ops import field_jax as fj
    from bulletproofs_tpu.ops import transcript_device as td
    from bulletproofs_tpu.ops.ec_host import msm_host
    from bulletproofs_tpu.utils import get_generators
    fr = ctx.fr
    rng = random.Random(3)
    G = get_generators("G", n)
    H = get_generators("H", n)
    Q = G1.from_msg_hash(b"Q")
    one = Scalar.one()
    a = [Scalar.random(rng) for _ in range(n)]
    b = [Scalar.random(rng) for _ in range(n)]
    table = G + H + [Q]
    dev, aff = ej.to_device_points_affine(table, ctx)
    pts = jnp.concatenate([dev, jnp.asarray(ctx.identity)], axis=2)
    A = pd._mont(fr, a)
    B = pd._mont(fr, b)
    rG = pd._mont(fr, [one] * n)
    rH = pd._mont(fr, [one] * n)
    lg_n = n.bit_length() - 1

    # (a) scalar build: traced vs static round index
    sc_t = jax.jit(lambda A, B, rG, rH: pd._ipa_round_scalars_traced(
        A, B, rG, rH, jnp.int32(0), lg_n, fr))(A, B, rG, rH)
    sc_s = pd._ipa_round_scalars(A, B, rG, rH, n, fr)
    sc_t_np, sc_s_np = jax.device_get((sc_t, sc_s))
    ok_a = bool((sc_t_np == sc_s_np).all())
    print(f"round0 scalars traced==static: {'OK' if ok_a else 'MISMATCH'}",
          flush=True)

    # host-int view of the scalars for the reference MSM
    vals = [fj.limbs_to_ints(sc_s_np[s]) for s in range(2)]

    # (b) MSM + device combine, exactly as _ipa_fused_jit.msm_round
    c = msm_mod.pick_window(2 * n + 2)
    W = -(-ctx.cv.fr.n_bits // c)
    plan = msm_mod.window_plan(ctx, c, n_sets=2, dup=msm_mod._use_dup())
    rounds = pd._fused_memo.get((n, c, ctx.cv.name),
                                msm_mod.occupancy_guess(n + 1, ctx, c))

    @jax.jit
    def msm_round(scal2):
        digits = msm_mod._digits_multi(scal2, ctx, c)
        buckets, occ = msm_mod.bucket_accumulate(
            pts, digits, ctx, c, rounds, plan=plan, affine=True)
        rowsum, colsum = msm_mod.bucket_rowcol(buckets, ctx, c)
        LR = msm_mod.combine_from_rowcol(rowsum, colsum, ctx, c,
                                         wins_per_set=W)
        return LR, occ

    LR_dev, occ = msm_round(jnp.asarray(sc_s_np))
    occ = int(jax.device_get(occ))
    print(f"round0 occ={occ} rounds={rounds}", flush=True)
    got = ej.from_device_points(LR_dev, ctx)
    want = [msm_host(table + [G1.identity()],
                     [Scalar(v) for v in vals[s]]) for s in range(2)]
    ok_b = all(g.to_bytes() == w.to_bytes() for g, w in zip(got, want))
    print(f"round0 MSM+device-combine: {'OK' if ok_b else 'MISMATCH'}",
          flush=True)
    if not ok_b:
        for i, (g, w) in enumerate(zip(got, want)):
            if g.to_bytes() != w.to_bytes():
                print(f"  set {i}: got  {g.to_bytes().hex()[:48]}...")
                print(f"         want {w.to_bytes().hex()[:48]}...")

    # (c) device serialization of the device results
    pb = np.asarray(jax.jit(lambda p: td.serialize_points(p, ctx))(LR_dev))
    ok_c = all(bytes(pb[i].astype(np.uint8)) == g.to_bytes()
               for i, g in enumerate(got))
    print(f"round0 serialize: {'OK' if ok_c else 'MISMATCH'}", flush=True)


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
            elif s.startswith("mixed"):
                stage_mixed(ctx, int(s[5:] or 2048))
            elif s.startswith("round0"):
                stage_round0(ctx, int(s[6:] or 2048))


if __name__ == "__main__":
    main()
