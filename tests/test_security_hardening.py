"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. high — conversion caches must key on FULL point content, not samples.
2. medium — generator disk cache must be JSON (no pickle) and validated.
3. low — from_bytes on cofactor>1 curves must reject out-of-subgroup points.
"""

import json
import os
import random

import pytest

from bulletproofs_tpu.config import ED25519, using_curve
from bulletproofs_tpu.ops.ec_host import G1
from bulletproofs_tpu.ops.field_host import Scalar


def test_conv_cache_distinguishes_middle_points():
    """Two lists equal at first/middle/last samples but differing elsewhere
    must NOT alias in the jax backend conversion cache (ADVICE r2 high)."""
    from bulletproofs_tpu.ops import ec_jax as ej
    from bulletproofs_tpu.ops.jax_backend import _ConvCache

    rnd = random.Random(1)
    pts_a = [G1.random(rnd) for _ in range(8)]
    pts_b = list(pts_a)
    pts_b[1] = G1.random(rnd)          # differs at a non-sampled index
    assert pts_a[0] == pts_b[0] and pts_a[4] == pts_b[4] \
        and pts_a[-1] == pts_b[-1]

    ctx = ej.CurveCtx(pts_a[0].cv)
    cache = _ConvCache()
    dev_a, _ = cache.get(pts_a, ctx)
    dev_b, _ = cache.get(pts_b, ctx)
    back_a = ej.from_device_points(dev_a[:, :, 1:2], ctx)[0]
    back_b = ej.from_device_points(dev_b[:, :, 1:2], ctx)[0]
    assert back_a == pts_a[1]
    assert back_b == pts_b[1]
    assert back_a != back_b


def test_generator_cache_rejects_tampered_file(tmp_path, monkeypatch):
    """A planted/corrupted generator cache file must be discarded and the
    generators re-derived from hash-to-curve (ADVICE r2 medium)."""
    import bulletproofs_tpu.utils.generators as gens

    monkeypatch.setattr(gens, "_DISK_DIR", str(tmp_path))
    gens._cached.cache_clear()

    honest = gens.get_generators("T", 6)
    path = gens._disk_path(honest[0].cv.name, "T")
    assert os.path.exists(path)

    # Tamper: replace entry 2 with a DIFFERENT valid curve point (on-curve,
    # so only the spot-check can catch it).
    with open(path) as f:
        raw = json.load(f)
    evil = G1.random(random.Random(99))
    raw[2] = [hex(evil.X), hex(evil.Y), hex(evil.Z)]
    with open(path, "w") as f:
        json.dump(raw, f)

    gens._cached.cache_clear()
    again = gens.get_generators("T", 6)
    assert again == honest              # tamper discarded, re-derived

    # Corrupt: not JSON at all.
    with open(path, "w") as f:
        f.write("\x80\x04not json")
    gens._cached.cache_clear()
    assert gens.get_generators("T", 6) == honest


def test_from_bytes_rejects_small_subgroup_point():
    """ed25519's Weierstrass form has cofactor 8; a serialized point outside
    the prime-order subgroup must be rejected (ADVICE r2 low)."""
    with using_curve(ED25519):
        cv = ED25519
        # Find a curve point NOT in the r-order subgroup: take hash-to-curve
        # pre-cofactor-clearing candidates until one has a cofactor component.
        import hashlib
        from bulletproofs_tpu.ops.ec_host import _sqrt_mod
        x = int.from_bytes(hashlib.shake_256(b"sub").digest(cv.modbytes),
                           "big") % cv.p
        pt = None
        while True:
            rhs = (x * x % cv.p * x + cv.a * x + cv.b) % cv.p
            y = _sqrt_mod(rhs, cv.p)
            if y is not None:
                cand = G1(x, y, 1, cv)
                if not cand._mul_int(cv.r).is_identity():
                    pt = cand
                    break
            x += 1
        raw = pt.to_bytes()
        with pytest.raises(AssertionError):
            G1.from_bytes(raw)
        # and a legit subgroup point still round-trips
        good = G1.from_msg_hash(b"legit")
        assert G1.from_bytes(good.to_bytes()) == good
