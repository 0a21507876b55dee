"""Device STROBE/merlin transcript vs the host ProofTranscript: byte-exact
state evolution, challenge derivation, point serialization, and writeback
continuity (the properties the fused IPA relies on)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

import bulletproofs_tpu as bp
from bulletproofs_tpu.config import BLS381, using_curve
from bulletproofs_tpu.ops import ec_jax as ej
from bulletproofs_tpu.ops import transcript_device as td
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript import ProofTranscript


def _ctx():
    return ej.CurveCtx(BLS381)


def test_serialize_points_matches_to_bytes():
    rng = random.Random(3)
    with using_curve(BLS381):
        ctx = _ctx()
        pts = [G1.random(rng) for _ in range(5)] + [G1.identity()]
        # force non-trivial Z: add two points without normalizing
        pts[1] = pts[1] + pts[2]
        dev = ej.to_device_points(pts, ctx)
        got = np.asarray(jax.jit(
            lambda p: td.serialize_points(p, ctx))(dev))
        for i, pt in enumerate(pts):
            assert bytes(got[i].astype(np.uint8)) == pt.to_bytes(), i


def test_reduce_bytes_mod_r_matches_from_bytes():
    rng = random.Random(4)
    with using_curve(BLS381):
        ctx = _ctx()
        for _ in range(4):
            raw = bytes(rng.randrange(256) for _ in range(BLS381.modbytes))
            want = Scalar.from_bytes(raw)
            arr = jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.uint32))
            got_m = jax.jit(
                lambda b: td.reduce_bytes_mod_r(b, ctx))(arr)
            got = ctx.fr.from_mont(got_m)[0]
            assert got == want.v


def test_device_transcript_matches_host_schedule():
    """Run the exact per-round IPA schedule (commit L, commit R, challenge
    u) on both transcripts: identical challenges and identical final strobe
    state, including across rate-boundary permutations."""
    rng = random.Random(5)
    with using_curve(BLS381):
        ctx = _ctx()
        host = ProofTranscript(b"tdtest")
        host.innerproduct_domain_sep(64)

        pts = [G1.random(rng) for _ in range(8)]
        dev_pts = ej.to_device_points(pts, ctx)

        snap_state, pos, pb, fl = td.DeviceTranscript.snapshot(host)

        def run(state, P):
            t = td.DeviceTranscript.from_snapshot(
                jnp.asarray(state), pos, pb, fl)
            chals = []
            pbytes = td.serialize_points(P, ctx)
            for j in range(4):
                t.commit_point_bytes(b"L", pbytes[2 * j])
                t.commit_point_bytes(b"R", pbytes[2 * j + 1])
                chals.append(t.challenge_scalar_mont(b"u", ctx))
            return t.strobe.st, jnp.concatenate(chals, axis=1)

        final_dev, chals_m = jax.jit(run)(snap_state, dev_pts)
        got_chals = ctx.fr.from_mont(chals_m)

        want_chals = []
        for j in range(4):
            host.commit_point(b"L", pts[2 * j])
            host.commit_point(b"R", pts[2 * j + 1])
            want_chals.append(host.challenge_scalar(b"u").v)
        assert got_chals == want_chals
        assert bytes(np.asarray(final_dev).astype(np.uint8)) == \
            bytes(host.strobe.state)

        # writeback continuity: a host transcript patched with the device
        # state must draw the SAME next challenge as the host original
        sched = []
        for j in range(4):
            sched += [("msg", b"L", 97), ("msg", b"R", 97),
                      ("challenge", b"u", BLS381.modbytes)]
        host2 = ProofTranscript(b"tdtest")
        host2.innerproduct_domain_sep(64)
        rp, rpb, rfl = td.replay_positions(host2, sched)
        assert (rp, rpb, rfl) == (host.strobe.pos, host.strobe.pos_begin,
                                  host.strobe.cur_flags)
        td.DeviceTranscript.writeback(host2, np.asarray(final_dev),
                                      rp, rpb, rfl)
        assert host2.challenge_scalar(b"next").v == \
            host.challenge_scalar(b"next").v


def test_device_transcript_long_absorb_crosses_rate():
    """A message longer than the 166-byte rate (forces mid-absorb
    permutation on the variable path)."""
    rng = random.Random(6)
    with using_curve(BLS381):
        ctx = _ctx()
        host = ProofTranscript(b"long")
        data = bytes(rng.randrange(256) for _ in range(400))

        snap_state, pos, pb, fl = td.DeviceTranscript.snapshot(host)

        def run(state, msg):
            t = td.DeviceTranscript.from_snapshot(state, pos, pb, fl)
            t.append_message_var(b"blob", msg)
            cb = t.challenge_bytes(b"c", 48)      # mutates t.strobe.st
            return t.strobe.st, cb

        final_dev, cb = jax.jit(run)(
            jnp.asarray(snap_state),
            jnp.asarray(np.frombuffer(data, np.uint8).astype(np.uint32)))
        host.append_message(b"blob", data)
        want = host.challenge_bytes(b"c", 48)
        assert bytes(np.asarray(cb).astype(np.uint8)) == want
        assert bytes(np.asarray(final_dev).astype(np.uint8)) == \
            bytes(host.strobe.state)
