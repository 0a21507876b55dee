"""Generate the frozen golden-vector pack (tests/vectors/*.json).

These vectors freeze the externally-observable behavior this library claims
is AMCL/reference-equivalent (VERDICT r2 missing #1), so that any future
environment WITH a Rust toolchain can diff against
`lovesh/bulletproofs-amcl` in minutes:

  - generators.json  — affine coordinates of g, h, G1..G64, H1..H8 per curve
    (reference: `get_generators` /root/reference/src/utils/mod.rs:16-23,
    hash-to-curve via amcl `ECP::mapit` on SHAKE256(msg, MODBYTES))
  - transcript.json  — challenge streams for a scripted label sequence
    (reference: /root/reference/src/transcript.rs:29-61 over merlin 1.x)
  - proofs.json      — full serialized bound-check proofs under seeded
    blinding (deterministic rng), per curve
    (reference: gen_proof_of_bounded_num,
    /root/reference/src/r1cs/gadgets/bound_check.rs:133)

Regenerate with:  python scripts/gen_golden_vectors.py
The committed files are FROZEN; tests/test_golden_vectors.py recomputes and
compares.  A diff means the library's observable protocol behavior changed —
which breaks proof interop — and must never happen silently.

AMCL-equivalence status per curve (see AUDIT.md for the full per-primitive
audit): bls381/bn254/secp256k1 encodings follow amcl's uncompressed ECP
layout and are *believed* byte-compatible (unverified without Rust);
ed25519 is KNOWINGLY DIVERGENT — amcl uses the Edwards-form curve with its
own encoding, this library maps to short Weierstrass (config.py) — so the
ed25519 vectors document THIS library's behavior only.
"""

import json
import os
import random
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bulletproofs_tpu as bp
from bulletproofs_tpu.config import CURVES, using_curve
from bulletproofs_tpu.models.bound_check import gen_proof_of_bounded_num
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.transcript.protocol import ProofTranscript
from bulletproofs_tpu.utils.generators import get_generators

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

CURVE_NAMES = ["bls381", "bn254", "secp256k1", "ed25519"]


def _ser_affine(p):
    """The SERIALIZED affine coordinates (what to_bytes emits — identical
    to .affine() on Weierstrass-serialized curves; twisted-Edwards (x, y)
    on ed25519, matching AMCL's ECP layout)."""
    if p.cv.ed_d is not None:
        return p.to_edwards()
    return p.affine()


def gen_generator_vectors():
    out = {}
    for name in CURVE_NAMES:
        with using_curve(CURVES[name]):
            entry = {}
            for label in ("g", "h"):
                p = G1.from_msg_hash(label.encode())
                x, y = _ser_affine(p)
                entry[label] = [hex(x), hex(y)]
            entry["G"] = [[hex(x), hex(y)] for x, y in
                          (_ser_affine(p) for p in get_generators("G", 64))]
            entry["H"] = [[hex(x), hex(y)] for x, y in
                          (_ser_affine(p) for p in get_generators("H", 8))]
            out[name] = entry
    return out


def gen_transcript_vectors():
    """A scripted schedule exercising every TranscriptProtocol method
    (transcript.rs:29-61): domain seps, scalar/point commits, challenges."""
    out = {}
    for name in CURVE_NAMES:
        with using_curve(CURVES[name]):
            t = ProofTranscript(b"golden")
            stream = []
            t.r1cs_domain_sep()
            t.innerproduct_domain_sep(64)
            t.commit_scalar(b"s1", Scalar(12345))
            c1 = t.challenge_scalar(b"c1")
            stream.append(hex(c1.v))
            t.commit_point(b"P1", G1.from_msg_hash(b"vector-point"))
            c2 = t.challenge_scalar(b"c2")
            stream.append(hex(c2.v))
            t.r1cs_1phase_domain_sep()
            t.commit_scalar(b"s2", c1 * c2)
            for i in range(4):
                ci = t.challenge_scalar(b"u")
                stream.append(hex(ci.v))
            t.r1cs_2phase_domain_sep()
            # raw challenge_bytes as well (pre-reduction), to pin the merlin
            # STROBE stream itself, not only the mod-r reduction
            raw = t.challenge_bytes(b"raw", 32)
            out[name] = {"challenges_mod_r": stream, "raw32": raw.hex()}
    return out


def gen_proof_vectors():
    out = {}
    for name in CURVE_NAMES:
        with using_curve(CURVES[name]):
            rng = random.Random(0xB00B5)
            G = get_generators("G", 128)
            H = get_generators("H", 128)
            g = G1.from_msg_hash(b"g")
            h = G1.from_msg_hash(b"h")
            blinding = Scalar(0x1234567890ABCDEF, CURVES[name])
            proof, comms = gen_proof_of_bounded_num(
                27, blinding, 10, 100, 32, rng, b"golden-proof", g, h, G, H)
            out[name] = {
                "value": 27, "min": 10, "max": 100, "bit_size": 32,
                "blinding": hex(blinding.v), "rng_seed": "0xB00B5",
                "transcript_label": "golden-proof",
                "proof_bytes": proof.to_bytes().hex(),
                "commitments": [c.to_bytes().hex() for c in comms],
            }
    return out


def gen_poseidon_proof_vectors():
    """Poseidon-hash-4 preimage proofs (all 3 s-boxes) and a depth-3 SMT-4
    leaf-inclusion proof under seeded blinding, per curve with width-5
    constants.  Pins the LC-synthesis path of the Poseidon/SMT gadget family
    (`/root/reference/src/r1cs/gadgets/poseidon_hash.rs:74-499`,
    `sparse_merkle_tree_4_ary.rs:22-130`) byte-for-byte."""
    from bulletproofs_tpu.models import poseidon_hash as ph
    from bulletproofs_tpu.models import sparse_merkle_tree_4_ary as smt4
    from bulletproofs_tpu.models.helper_constraints.poseidon import (
        Poseidon_hash_4, PoseidonParams, SboxType)
    from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_4_ary \
        import VanillaSparseMerkleTree_4
    from bulletproofs_tpu.utils.hash_db import InMemoryHashDb

    out = {}
    for name in CURVE_NAMES:
        with using_curve(CURVES[name]):
            try:
                params = PoseidonParams(5, 4, 4, 56)
            except Exception:
                continue            # no width-5 constants for this curve
            rng = random.Random(0xCAFE)
            G = get_generators("G", 2048)
            H = get_generators("H", 2048)
            g = G1.from_msg_hash(b"g")
            h = G1.from_msg_hash(b"h")
            entry = {"rng_seed": "0xCAFE", "rounds": [4, 4, 56], "width": 5,
                     "hash4": {}, "smt4_depth3": {}}
            inputs = [Scalar(11), Scalar(22), Scalar(33), Scalar(44)]
            for sbox in (SboxType.Quint, SboxType.Cube, SboxType.Inverse):
                expected = Poseidon_hash_4(inputs, params, sbox)
                proof, comms = \
                    ph.gen_proof_of_knowledge_of_preimage_of_Poseidon_4(
                        inputs, None, expected, params, sbox, rng,
                        b"golden-pos4", g, h, G, H)
                entry["hash4"][sbox] = {
                    "expected_output": hex(expected.v),
                    "proof_bytes": proof.to_bytes().hex(),
                    "commitments": [c.to_bytes().hex() for c in comms],
                }
            db = InMemoryHashDb()
            tree = VanillaSparseMerkleTree_4(params, 3, db)
            tree.update(Scalar(9), Scalar(42), db)
            nodes = []
            leaf = tree.get(Scalar(9), nodes, db)
            proof, comms = smt4.gen_proof_of_leaf_inclusion_4_ary_merkle_tree(
                leaf, Scalar(9), None, nodes, tree.root, 3, params,
                SboxType.Quint, rng, b"golden-smt4", g, h, G, H)
            entry["smt4_depth3"] = {
                "root": hex(tree.root.v),
                "proof_bytes": proof.to_bytes().hex(),
                "commitments": [c.to_bytes().hex() for c in comms],
            }
            out[name] = entry
    return out


def main():
    os.makedirs(VEC_DIR, exist_ok=True)
    for fname, data in (
        ("generators.json", gen_generator_vectors()),
        ("transcript.json", gen_transcript_vectors()),
        ("proofs.json", gen_proof_vectors()),
        ("poseidon_proofs.json", gen_poseidon_proof_vectors()),
    ):
        path = os.path.join(VEC_DIR, fname)
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print("wrote", path)


if __name__ == "__main__":
    main()
