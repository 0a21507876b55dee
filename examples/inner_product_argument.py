"""Standalone inner-product argument: prove <a, b> = c against committed
bases (the protocol core, `/root/reference/src/ipp.rs`; BASELINE config #3
runs this at n = 2^16).

    python examples/inner_product_argument.py [n] [k_batch]
"""

import random
import sys
import time

sys.path.insert(0, ".")

import bulletproofs_tpu as bp
from bulletproofs_tpu import batch_verify_ipp, create_ipp, verify_ipp
from bulletproofs_tpu.ops.ec_host import msm_host
from bulletproofs_tpu.ops.field_host import Scalar, inner_product
from bulletproofs_tpu.transcript import ProofTranscript


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    assert n & (n - 1) == 0, "n must be a power of two"

    G = bp.get_generators("G", n)
    H = bp.get_generators("H", n)
    Q = bp.G1.from_msg_hash(b"Q")
    one = Scalar.one()
    ones = [one] * n

    def make(seed):
        rng = random.Random(seed)
        a = [Scalar.random(rng) for _ in range(n)]
        b = [Scalar.random(rng) for _ in range(n)]
        t0 = time.time()
        proof = create_ipp(ProofTranscript(b"ipa"), Q, ones, ones,
                           G, H, a, b)
        tp = time.time() - t0
        # the public commitment P = <a, G> + <b, H> + <a, b> Q
        P = msm_host(list(G) + list(H) + [Q],
                     a + b + [inner_product(a, b)])
        return proof, P, tp

    proofs = [make(100 + i) for i in range(k)]
    print(f"proved {k} IPAs at n={n}: "
          f"{sum(p[2] for p in proofs) / k * 1000:.0f} ms each "
          f"(proof = 2 log2(n) points + 2 scalars)")

    t0 = time.time()
    for proof, P, _ in proofs:
        verify_ipp(n, ProofTranscript(b"ipa"), ones, ones, P, Q, G, H,
                   proof.a, proof.b, proof.L, proof.R)
    t_ind = time.time() - t0

    t0 = time.time()
    batch_verify_ipp(n, G, H,
                     [(ProofTranscript(b"ipa"), ones, ones, P, Q,
                       proof.a, proof.b, proof.L, proof.R)
                      for proof, P, _ in proofs])
    t_bat = time.time() - t0
    print(f"verify: individual {t_ind / k * 1000:.0f} ms/proof | "
          f"batched {t_bat / k * 1000:.0f} ms/proof "
          f"({t_ind / t_bat:.2f}x)")


if __name__ == "__main__":
    main()
