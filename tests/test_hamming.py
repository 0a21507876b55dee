"""Hamming-distance gadget round trip (`hamming_distance.rs:155-218` uses 150
elements; 12 keeps CI quick while covering zero and non-zero diffs)."""

from bulletproofs_tpu.models import hamming_distance as hd
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar
from bulletproofs_tpu.utils import get_generators


def test_hamming_distance(rng):
    G = get_generators("G", 64)
    H = get_generators("H", 64)
    g = G1.from_msg_hash(b"g")
    h = G1.from_msg_hash(b"h")
    n = 12
    original = [Scalar.random(rng) for _ in range(n)]
    new = list(original)
    for i in (1, 4, 7):
        new[i] = new[i] + Scalar(1)
    proof, comms = hd.gen_proof_for_hamming_distance(
        original, new, 3, b"Hamming", g, h, G, H, rng=rng)
    hd.verify_proof_for_hamming_distance(
        new, 3, proof, comms, b"Hamming", g, h, G, H)
