"""Transcript stack: keccak-f, STROBE-128, merlin, TranscriptProtocol."""

import hashlib

from bulletproofs_tpu.transcript import Transcript, ProofTranscript
from bulletproofs_tpu.transcript.keccak import keccak_f1600
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.config import curve


def test_keccak_f1600_vs_sha3():
    """Cross-check the raw permutation through hashlib's SHA3-256 sponge:
    one permutation, rate 136, pad 0x06...0x80."""
    msg = b"keccak permutation cross-check"
    state = bytearray(200)
    padded = bytearray(136)
    padded[:len(msg)] = msg
    padded[len(msg)] ^= 0x06
    padded[135] ^= 0x80
    for i in range(136):
        state[i] ^= padded[i]
    keccak_f1600(state)
    assert bytes(state[:32]) == hashlib.sha3_256(msg).digest()


def test_merlin_conformance_vector():
    """Published test vector from the merlin crate (transcript.rs tests)."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    c = t.challenge_bytes(b"challenge", 32)
    assert c.hex() == \
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_multi_round():
    """Same operations => same challenges; different data => different."""
    def run(data):
        t = Transcript(b"proto")
        t.append_u64(b"n", 64)
        t.append_message(b"pt", data)
        return [t.challenge_bytes(b"u", 48) for _ in range(3)]

    a = run(b"hello")
    b = run(b"hello")
    c = run(b"hellp")
    assert a == b
    assert a[0] != c[0]
    assert len(set(a)) == 3  # successive challenges differ


def test_challenge_scalar_reduction():
    """challenge_scalar draws MODBYTES bytes and reduces mod r
    (transcript.rs:55-60)."""
    t1 = ProofTranscript(b"x")
    s = t1.challenge_scalar(b"c")
    t2 = ProofTranscript(b"x")
    raw = t2.challenge_bytes(b"c", curve().modbytes)
    assert s.v == int.from_bytes(raw, "big") % curve().r


def test_commit_point_scalar_layout():
    """Scalars are MODBYTES big-endian; points are 0x04||x||y."""
    from bulletproofs_tpu.ops.ec_host import G1
    t1 = ProofTranscript(b"x")
    t2 = ProofTranscript(b"x")
    s = Scalar(123456789)
    t1.commit_scalar(b"s", s)
    t2.append_message(b"s", (123456789).to_bytes(curve().modbytes, "big"))
    assert t1.challenge_bytes(b"c", 16) == t2.challenge_bytes(b"c", 16)

    g = G1.generator()
    t3 = ProofTranscript(b"x")
    t4 = ProofTranscript(b"x")
    t3.commit_point(b"p", g)
    mb = curve().modbytes
    t4.append_message(b"p", b"\x04" + curve().gx.to_bytes(mb, "big")
                      + curve().gy.to_bytes(mb, "big"))
    assert t3.challenge_bytes(b"c", 16) == t4.challenge_bytes(b"c", 16)
