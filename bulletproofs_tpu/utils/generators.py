"""Deterministic generator derivation (`/root/reference/src/utils/mod.rs:16-23`).

G_i = hash_to_curve(prefix || str(i+1)); no trusted setup, recomputable from
labels alone (the reference notes generators should be persisted in practice,
`sparse_merkle_tree_4_ary.rs:250` — we cache by (curve, prefix, n)).
"""

from functools import lru_cache

from ..config import curve
from ..ops.ec_host import G1


@lru_cache(maxsize=64)
def _cached(curve_name, prefix, n):
    return tuple(G1.from_msg_hash(f"{prefix}{i + 1}".encode())
                 for i in range(n))


def get_generators(prefix: str, n: int):
    cached = _cached(curve().name, prefix, n)
    return list(cached)


def gen_challenges(inputs, state: bytearray, n: int):
    """Chained hash-to-field challenges (`utils/mod.rs:25-39`; dead code in
    the reference, kept for API parity): absorb the input points' bytes into
    `state`, then derive n challenges, each absorbing gen*prev."""
    from ..ops.field_host import Scalar

    for pt in inputs:
        state.extend(pt.to_bytes())
    out = [Scalar.from_msg_hash(bytes(state))]
    gen = G1.generator()
    for _ in range(1, n):
        p = gen * out[-1]
        state.extend(p.to_bytes())
        out.append(Scalar.from_msg_hash(bytes(state)))
    return out
