"""End-to-end demo: prove knowledge of a leaf in a sparse Merkle tree
without revealing the leaf index or value.

Builds a 4-ary sparse Merkle tree over Poseidon (width 5), inserts a few
values, then proves/verifies inclusion of one leaf in zero knowledge —
the verifier learns only the tree root.  Mirrors the reference flow of
`/root/reference/src/r1cs/gadgets/sparse_merkle_tree_4_ary.rs:242-305`.

Run: python examples/merkle_membership.py [--depth 8]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import bulletproofs_tpu as bp
from bulletproofs_tpu.models import sparse_merkle_tree_4_ary as smt4
from bulletproofs_tpu.models.helper_constraints.poseidon import (
    PoseidonParams, SboxType)
from bulletproofs_tpu.models.helper_constraints.sparse_merkle_tree_4_ary \
    import VanillaSparseMerkleTree_4
from bulletproofs_tpu.utils.hash_db import InMemoryHashDb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=8,
                    help="tree depth (capacity 4^depth leaves)")
    args = ap.parse_args()
    rng = random.Random()

    params = PoseidonParams(5, 4, 4, 56)
    db = InMemoryHashDb()
    tree = VanillaSparseMerkleTree_4(params, args.depth, db)
    capacity = 4 ** args.depth          # indices must fit the tree depth
    for i in range(8):
        tree.update(bp.Scalar((37 * i + 5) % capacity), bp.Scalar(5000 + i),
                    db)

    idx = bp.Scalar((37 * 3 + 5) % capacity)
    proof_nodes = []
    leaf = tree.get(idx, proof_nodes, db)
    print(f"depth-{args.depth} tree built; proving inclusion of leaf "
          f"{leaf.v} at (hidden) index {idx.v}")

    # generator count must cover the circuit's multipliers, padded to pow2
    n_gens = 8192 if args.depth > 5 else 4096
    G = bp.get_generators("G", n_gens)
    H = bp.get_generators("H", n_gens)
    g = bp.G1.from_msg_hash(b"g")
    h = bp.G1.from_msg_hash(b"h")

    t0 = time.time()
    proof, comms = smt4.gen_proof_of_leaf_inclusion_4_ary_merkle_tree(
        leaf, idx, None, proof_nodes, tree.root, args.depth, params,
        SboxType.Quint, rng, b"SMT-demo", g, h, G, H)
    t1 = time.time()
    smt4.verify_proof_of_leaf_inclusion_4_ary_merkle_tree(
        tree.root, args.depth, params, SboxType.Quint, proof, comms,
        b"SMT-demo", g, h, G, H)
    t2 = time.time()
    print(f"proved in {t1 - t0:.2f}s, verified in {t2 - t1:.2f}s "
          f"(proof {len(proof.to_bytes())} bytes; verifier saw only the "
          f"root {hex(tree.root.v)[:18]}…)")


if __name__ == "__main__":
    main()
