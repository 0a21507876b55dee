"""Deterministic generator derivation (`/root/reference/src/utils/mod.rs:16-23`).

G_i = hash_to_curve(prefix || str(i+1)); no trusted setup, recomputable from
labels alone.  The reference notes generators should be persisted in
practice (`sparse_merkle_tree_4_ary.rs:250`): we cache in-process by
(curve, prefix, n) AND persist coordinates to disk (hash-to-curve is
host-serial Python — ~4 ms/point — so a 2^16 generator set would otherwise
cost minutes in every fresh process).

Disk format is plain JSON hex (no pickle: deserializing an
attacker-writable pickle is arbitrary code execution — ADVICE.md round 2,
medium), and loaded points are VALIDATED: every point must be on-curve,
and a sample of indices is re-derived via hash_to_curve and compared.  Any
mismatch discards the file and regenerates, so a corrupted or planted
cache cannot substitute generators with known discrete-log relations.
"""

import json
import os
from functools import lru_cache

from ..config import CURVES, curve
from ..ops.ec_host import G1

_DISK_DIR = os.environ.get("BP_GENERATOR_CACHE", "/root/.bp_generators")

# Indices re-derived from scratch on every disk load (plus the last entry).
_SPOT_CHECKS = 4

# Hash-to-curve SEMANTICS version, baked into the cache filename: bump it
# whenever from_msg_hash's observable output changes so stale caches are
# ignored, not spot-checked.  (Round-4 lesson: the round-3 even-parity fix
# left pre-fix secp256k1 caches in place, and a parity-flipped y is still
# on-curve — the fixed-stride spot checks missed the flipped entries and a
# stale cache leaked into the frozen golden vectors.)
#   v2 = round-3 even-parity y selection + round-4 ed25519 Edwards mapit
_SCHEMA = "v2"


def _disk_path(curve_name, prefix):
    return os.path.join(_DISK_DIR, f"{curve_name}_{prefix}_{_SCHEMA}.json")


def _derive(prefix, i, cv):
    return G1.from_msg_hash(f"{prefix}{i + 1}".encode(), cv)


def _load_validated(path, prefix, cv):
    """Load cached affine coordinates; return [] unless every point passes
    on-curve + spot-check validation."""
    try:
        with open(path, "r") as f:
            raw = json.load(f)
        coords = [(int(x, 16), int(y, 16), int(z, 16)) for x, y, z in raw]
    except Exception:
        return []
    if not coords:
        return []
    pts = []
    for X, Y, Z in coords:
        p = G1(X, Y, Z, cv)
        if not p.is_on_curve():
            return []
        pts.append(p)
    n = len(pts)
    # Small caches are FULLY re-derived (a few ms — and the check becomes
    # deterministic).  Large caches check fixed anchors + random indices
    # drawn from SystemRandom: os.urandom-backed,
    # so a tamperer cannot predict which entries are re-derived AND a
    # caller seeding the global `random` module cannot steer the draws
    # (the global-rng version made tamper detection a coin flip — caught
    # by tests/test_security_hardening.py flaking in round 5).
    if n <= 32:
        idxs = range(n)
    else:
        import random as _random
        sysrand = _random.SystemRandom()
        idxs = {0, n - 1}
        idxs.update(sysrand.randrange(n) for _ in range(_SPOT_CHECKS))
    for i in idxs:
        if pts[i] != _derive(prefix, i, cv):
            return []
    return coords


@lru_cache(maxsize=64)
def _cached(curve_name, prefix, n):
    cv = CURVES[curve_name]
    path = _disk_path(curve_name, prefix)
    coords = _load_validated(path, prefix, cv)
    if len(coords) < n:
        for i in range(len(coords), n):
            p = _derive(prefix, i, cv)
            coords.append((p.X, p.Y, p.Z))
        try:
            os.makedirs(_DISK_DIR, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump([[hex(X), hex(Y), hex(Z)] for X, Y, Z in coords], f)
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
