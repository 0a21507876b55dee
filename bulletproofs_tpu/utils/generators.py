"""Deterministic generator derivation (`/root/reference/src/utils/mod.rs:16-23`).

G_i = hash_to_curve(prefix || str(i+1)); no trusted setup, recomputable from
labels alone.  The reference notes generators should be persisted in
practice (`sparse_merkle_tree_4_ary.rs:250`): we cache in-process by
(curve, prefix, n) AND persist coordinates to disk (hash-to-curve is
host-serial Python — ~4 ms/point — so a 2^16 generator set would otherwise
cost minutes in every fresh process)."""

import os
import pickle
from functools import lru_cache

from ..config import CURVES, curve
from ..ops.ec_host import G1

_DISK_DIR = os.environ.get("BP_GENERATOR_CACHE", "/root/.bp_generators")


def _disk_path(curve_name, prefix):
    return os.path.join(_DISK_DIR, f"{curve_name}_{prefix}.pkl")


@lru_cache(maxsize=64)
def _cached(curve_name, prefix, n):
    cv = CURVES[curve_name]
    coords = []
    path = _disk_path(curve_name, prefix)
    try:
        with open(path, "rb") as f:
            coords = pickle.load(f)
    except Exception:
        coords = []
    if len(coords) < n:
        for i in range(len(coords), n):
            p = G1.from_msg_hash(f"{prefix}{i + 1}".encode(), cv)
            coords.append((p.X, p.Y, p.Z))
        try:
            os.makedirs(_DISK_DIR, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(coords, f)
            os.replace(tmp, path)                    # atomic
        except Exception:
            pass                                     # cache is best-effort
    return tuple(G1(X, Y, Z, cv) for X, Y, Z in coords[:n])


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
