"""Device-resident merlin/STROBE-128 transcript (VERDICT r3 task 2).

The host transcript (`transcript/{strobe,merlin,protocol}.py`) forces a
device->host sync per Fiat-Shamir challenge — at ~30 ms tunnel RTT x 2 calls
x log2(n) IPA rounds that latency FLOOR (~0.66 s at config #2) dominated the
device prove.  This module runs the SAME byte-exact STROBE-128 state machine
as XLA ops so challenge derivation can live inside one fused dispatch.

Key insight: the STROBE position registers (pos, pos_begin, cur_flags)
depend only on the SCHEDULE of operations (labels and lengths) — which is
static for a fixed protocol — never on the absorbed data.  So positions are
plain Python ints at trace time, every state update is a static-slice XOR,
and the only traced values are the absorbed bytes and the keccak
permutations.  A compiled transcript program is keyed by its starting
(pos, pos_begin, cur_flags) triple (callers pass them as static args).

Byte-exactness is tested against the host ProofTranscript
(tests/test_transcript_device.py) and enforced end-to-end by the fused IPA's
proof-byte-identity tests.
"""

import struct

import numpy as np

import jax.numpy as jnp

from ..transcript.strobe import (FLAG_A, FLAG_C, FLAG_I, FLAG_K, FLAG_M,
                                 STROBE_R)
from . import field_jax as fj
from .keccak_jax import keccak_f1600_device


class DeviceStrobe:
    """STROBE-128 over a (200,) uint32 device byte array.

    pos / pos_begin / cur_flags are PYTHON ints (trace-time static); the
    state array is traced.  Mirrors `transcript/strobe.py` op for op.
    """

    def __init__(self, state, pos, pos_begin, cur_flags):
        self.st = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    # ---- merlin surface ----
    def meta_ad_const(self, data: bytes, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb_const(data)

    def ad_const(self, data: bytes, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_const(data)

    def ad_var(self, dev_bytes, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_var(dev_bytes)

    def prf(self, n: int, more: bool):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    # ---- internals (same order of state mutations as the host) ----
    def _run_f(self):
        st = self.st
        st = st.at[self.pos].set(st[self.pos] ^ np.uint32(self.pos_begin))
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ np.uint32(0x04))
        st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ np.uint32(0x80))
        self.st = keccak_f1600_device(st)
        self.pos = 0
        self.pos_begin = 0

    def _absorb_const(self, data: bytes):
        i = 0
        while i < len(data):
            take = min(len(data) - i, STROBE_R - self.pos)
            chunk = np.frombuffer(data[i:i + take],
                                  np.uint8).astype(np.uint32)
            sl = slice(self.pos, self.pos + take)
            self.st = self.st.at[sl].set(self.st[sl] ^ jnp.asarray(chunk))
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _absorb_var(self, dev_bytes):
        """dev_bytes: (k,) uint32 byte values, k static (array shape)."""
        k = int(dev_bytes.shape[0])
        i = 0
        while i < k:
            take = min(k - i, STROBE_R - self.pos)
            sl = slice(self.pos, self.pos + take)
            self.st = self.st.at[sl].set(self.st[sl]
                                         ^ dev_bytes[i:i + take])
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int):
        outs = []
        got = 0
        while got < n:
            take = min(n - got, STROBE_R - self.pos)
            sl = slice(self.pos, self.pos + take)
            outs.append(self.st[sl])
            self.st = self.st.at[sl].set(jnp.zeros(take, jnp.uint32))
            self.pos += take
            got += take
            if self.pos == STROBE_R:
                self._run_f()
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags, "cannot change flags mid-op"
            return
        assert flags & (1 << 3) == 0, "transport not supported"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_const(bytes([old_begin, flags]))
        force_f = bool(flags & (FLAG_C | FLAG_K))
        if force_f and self.pos != 0:
            self._run_f()


class DeviceTranscript:
    """merlin v1 + the Bulletproofs TranscriptProtocol over DeviceStrobe.

    Construct from a host-`ProofTranscript` SNAPSHOT (state bytes + position
    registers) at trace time via `from_snapshot`; after the jitted program
    returns the final state array, `writeback` restores a host transcript
    that continues byte-identically.
    """

    def __init__(self, strobe: DeviceStrobe):
        self.strobe = strobe

    @staticmethod
    def snapshot(host_transcript):
        """Host ProofTranscript -> (state_u32 (200,) numpy, pos, pos_begin,
        cur_flags).  The array is the traced input; the ints are STATIC and
        must key the compiled program."""
        s = host_transcript.strobe
        return (np.frombuffer(bytes(s.state), np.uint8).astype(np.uint32),
                s.pos, s.pos_begin, s.cur_flags)

    @classmethod
    def from_snapshot(cls, state_arr, pos, pos_begin, cur_flags):
        return cls(DeviceStrobe(state_arr, pos, pos_begin, cur_flags))

    @staticmethod
    def writeback(host_transcript, final_state_np, pos, pos_begin,
                  cur_flags):
        """Overwrite a host transcript's strobe with the device result (the
        position registers come from a static replay, the bytes from the
        device)."""
        s = host_transcript.strobe
        s.state = bytearray(
            np.asarray(final_state_np).astype(np.uint8).tobytes())
        s.pos = pos
        s.pos_begin = pos_begin
        s.cur_flags = cur_flags

    # ---- merlin ----
    def append_message_var(self, label: bytes, dev_bytes):
        """append_message with device-resident message bytes (static len)."""
        data_len = struct.pack("<I", int(dev_bytes.shape[0]))
        self.strobe.meta_ad_const(label, False)
        self.strobe.meta_ad_const(data_len, True)
        self.strobe.ad_var(dev_bytes, False)

    def append_message_const(self, label: bytes, message: bytes):
        data_len = struct.pack("<I", len(message))
        self.strobe.meta_ad_const(label, False)
        self.strobe.meta_ad_const(data_len, True)
        self.strobe.ad_const(message, False)

    def challenge_bytes(self, label: bytes, n: int):
        data_len = struct.pack("<I", n)
        self.strobe.meta_ad_const(label, False)
        self.strobe.meta_ad_const(data_len, True)
        return self.strobe.prf(n, False)

    # ---- TranscriptProtocol (transcript/protocol.py) ----
    def commit_point_bytes(self, label: bytes, pt_bytes):
        """pt_bytes: (2*modbytes+1,) uint32 — from `serialize_points`."""
        self.append_message_var(label, pt_bytes)

    def challenge_scalar_mont(self, label: bytes, ctx):
        """MODBYTES challenge bytes reduced mod r, returned in Montgomery
        form (Lr, 1) — byte-exact analog of
        `protocol.py::challenge_scalar` / `transcript.rs:55-60`."""
        mb = ctx.cv.modbytes
        raw = self.challenge_bytes(label, mb)        # (mb,) uint32 BE bytes
        return reduce_bytes_mod_r(raw, ctx)


# ---------------------------------------------------------------------------
# Byte codecs (device analogs of G1.to_bytes / Scalar.from_bytes)
# ---------------------------------------------------------------------------

_POW_TABLES = {}


def _byte_pow_table(ctx):
    """(Lr, mb) Montgomery-form constants [256^(mb-1-i) * R mod r]: one
    mont_mul of plain byte values against column i yields byte*256^(mb-1-i)
    mod r in PLAIN form — the big-endian radix-256 recomposition."""
    key = ctx.cv.name
    tab = _POW_TABLES.get(key)
    if tab is None:
        r = ctx.cv.r
        mb = ctx.cv.modbytes
        R = 1 << (16 * ctx.fr.L)
        vals = [(pow(256, mb - 1 - i, r) * R) % r for i in range(mb)]
        tab = _POW_TABLES[key] = np.asarray(
            fj.ints_to_limbs(vals, ctx.fr.L))
        _POW_TABLES[key] = tab
    return tab


def reduce_bytes_mod_r(raw_bytes, ctx):
    """(mb,) uint32 big-endian byte values -> (Lr, 1) Montgomery scalar
    mod r (the `Scalar.from_bytes` reduction)."""
    fr = ctx.fr
    mb = int(raw_bytes.shape[0])
    bl = jnp.zeros((fr.L, mb), jnp.uint32).at[0].set(raw_bytes)
    # mont_mul(plain byte, 256^k * R) = byte * 256^k mod r (plain)
    prod = fj.mont_mul(bl, jnp.asarray(_byte_pow_table(ctx)), fr)
    acc = prod
    m = mb
    while m > 1:
        half = (m + 1) // 2
        left = acc[:, :half]
        right = acc[:, half:m]
        if right.shape[1] < half:
            right = jnp.concatenate(
                [right, jnp.zeros((fr.L, half - right.shape[1]),
                                  jnp.uint32)], axis=1)
        acc = fj.add_mod(left, right, fr)
        m = half
    return fj._to_mont_jit(acc, fr)                 # (Lr, 1) Montgomery


_BYTE_IDX = {}


def _limb_byte_plan(ctx):
    """Static (limb_index, shift) arrays mapping big-endian byte position
    j in [0, mb) to 16-bit limb (little-endian limb order)."""
    key = ctx.cv.name
    plan = _BYTE_IDX.get(key)
    if plan is None:
        mb = ctx.cv.modbytes
        L = ctx.fp.L
        idx = np.zeros(mb, np.int32)
        sh = np.zeros(mb, np.uint32)
        valid = np.zeros(mb, bool)
        for j in range(mb):
            byte_pos = mb - 1 - j                    # little-endian byte no.
            li = byte_pos // 2
            if li < L:
                idx[j] = li
                sh[j] = 8 * (byte_pos % 2)
                valid[j] = True
        plan = _BYTE_IDX[key] = (idx, sh, valid)
    return plan


def serialize_points(pts_mont, ctx):
    """(3, L, k) Montgomery projective points -> (k, 2*mb+1) uint32 bytes,
    exactly `G1.to_bytes` (0x04 || x_be || y_be, identity -> (0, 1);
    `transcript.rs:51-53`).  Costs one batched Fermat inversion of Z."""
    assert ctx.cv.ed_d is None, \
        "device serializer emits Weierstrass bytes; Edwards-serialized " \
        "curves (ed25519) must use the host transcript path"
    fp = ctx.fp
    X, Y, Z = pts_mont[0], pts_mont[1], pts_mont[2]   # (L, k)
    z_inv = fj.inv_mont(Z, fp)                        # 0 stays 0
    x_m = fj.mont_mul(X, z_inv, fp)
    y_m = fj.mont_mul(Y, z_inv, fp)
    one = jnp.zeros_like(x_m).at[0].set(1)
    x_p = fj.mont_mul(x_m, one, fp)                   # plain 16-bit limbs
    y_p = fj.mont_mul(y_m, one, fp)
    is_id = jnp.all(Z == 0, axis=0)                   # (k,)
    x_p = jnp.where(is_id[None, :], 0, x_p)
    y_p = jnp.where(is_id[None, :], one, y_p)         # affine() -> (0, 1)

    idx, sh, valid = _limb_byte_plan(ctx)
    k = x_p.shape[1]

    def to_be(limbs):
        b = (limbs[idx, :] >> jnp.asarray(sh)[:, None]) & 0xFF  # (mb, k)
        return jnp.where(jnp.asarray(valid)[:, None], b, 0)

    bx = to_be(x_p)
    by = to_be(y_p)
    four = jnp.full((1, k), 4, jnp.uint32)
    return jnp.concatenate([four, bx, by], axis=0).T  # (k, 2mb+1)


def replay_positions(host_transcript, schedule):
    """Replay an op SCHEDULE (lengths only) on a CLONE of the host
    transcript with dummy bytes, returning the final (pos, pos_begin,
    cur_flags) — the data-independent half of the device run, needed for
    `DeviceTranscript.writeback` (jit caching skips Python tracing, so the
    static registers must be recomputed outside the compiled program).

    schedule: list of ("msg", label, length) | ("challenge", label, length).
    """
    t = host_transcript.clone()
    for op in schedule:
        kind, label, length = op
        if kind == "msg":
            t.append_message(label, bytes(length))
        else:
            t.challenge_bytes(label, length)
    s = t.strobe
    return s.pos, s.pos_begin, s.cur_flags
