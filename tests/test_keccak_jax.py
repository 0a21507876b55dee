"""Device keccak-f[1600] vs the host spec implementation."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from bulletproofs_tpu.ops.keccak_jax import keccak_f1600_device
from bulletproofs_tpu.transcript.keccak import keccak_f1600


def test_keccak_device_matches_host():
    rng = random.Random(0x5EED)
    for trial in range(4):
        raw = bytes(rng.randrange(256) for _ in range(200))
        host = bytearray(raw)
        keccak_f1600(host)
        dev = jax.jit(keccak_f1600_device)(
            jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.uint32)))
        assert bytes(np.asarray(dev).astype(np.uint8)) == bytes(host), \
            f"trial {trial}"


def test_keccak_device_double_permute():
    """Two chained permutations (the common STROBE pattern)."""
    raw = bytes(range(200))
    host = bytearray(raw)
    keccak_f1600(host)
    keccak_f1600(host)
    f = jax.jit(lambda s: keccak_f1600_device(keccak_f1600_device(s)))
    dev = f(jnp.asarray(np.frombuffer(raw, np.uint8).astype(np.uint32)))
    assert bytes(np.asarray(dev).astype(np.uint8)) == bytes(host)
