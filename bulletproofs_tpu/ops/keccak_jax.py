"""Device keccak-f[1600]: the merlin/STROBE transcript permutation as pure
uint32 XLA ops (VERDICT r3 task 2 — the device-resident transcript that
collapses the IPA's per-round host round-trips).

64-bit lanes are carried as (lo, hi) uint32 pairs (TPU has no native u64);
the whole permutation is ~100 vector ops of width 25 per round, 24 rounds,
traced inline wherever a transcript op needs it.  Byte-exact vs the host
implementation (`transcript/keccak.py` — the spec; tests/test_keccak_jax.py).
"""

import numpy as np

import jax.numpy as jnp

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)
_RC_LO = (_RC & 0xFFFFFFFF).astype(np.uint32)
_RC_HI = (_RC >> 32).astype(np.uint32)

# rho rotation amount for lane index i = x + 5y (same [x][y] table as the
# host keccak.py)
_ROTC_XY = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
            [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
# rho+pi as one static gather: out lane j = rotl(in lane SRC[j], ROT[j]).
# b[y][(2x+3y)%5] = rotl(a[x][y], rotc[x][y]); lane index = x + 5y, so the
# OUTPUT lane for input (x, y) is y + 5*((2x+3y)%5).
_PI_SRC = np.zeros(25, dtype=np.int32)
_PI_ROT = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _out = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_out] = _x + 5 * _y
        _PI_ROT[_out] = _ROTC_XY[_x][_y]
_SWAP = _PI_ROT >= 32
_M32 = np.where(_SWAP, _PI_ROT - 32, _PI_ROT).astype(np.uint32)  # rot % 32
_MZ = _M32 == 0


def _rotl_pair(lo, hi, m32, swap, mz):
    """Element-wise rotl64 of (lo, hi) u32 vectors by static amounts:
    m32 = rot % 32, swap = rot >= 32, mz = (rot % 32 == 0).  Static numpy
    masks keep the >>(32-0) undefined-shift case out of the graph."""
    a = jnp.where(swap, hi, lo)
    b = jnp.where(swap, lo, hi)
    sh = jnp.asarray(m32, jnp.uint32)
    inv = jnp.asarray((32 - m32) % 32, jnp.uint32)
    lo2 = jnp.where(mz, a, (a << sh) | (b >> inv))
    hi2 = jnp.where(mz, b, (b << sh) | (a >> inv))
    return lo2, hi2


def keccak_f1600_lanes(lo, hi):
    """(25,) uint32 lo/hi lanes (lane i = x + 5y) -> permuted lanes."""
    pi_src = jnp.asarray(_PI_SRC)
    for rnd in range(24):
        # theta: C[x] = xor_y A[x, y]; lane i = x + 5y -> reshape (5, 5)
        # gives [y, x]
        g_lo = lo.reshape(5, 5)
        g_hi = hi.reshape(5, 5)
        c_lo = g_lo[0] ^ g_lo[1] ^ g_lo[2] ^ g_lo[3] ^ g_lo[4]   # (5,) per x
        c_hi = g_hi[0] ^ g_hi[1] ^ g_hi[2] ^ g_hi[3] ^ g_hi[4]
        c1_lo = jnp.roll(c_lo, -1)       # C[(x+1)%5]
        c1_hi = jnp.roll(c_hi, -1)
        r1_lo = (c1_lo << 1) | (c1_hi >> 31)
        r1_hi = (c1_hi << 1) | (c1_lo >> 31)
        d_lo = jnp.roll(c_lo, 1) ^ r1_lo                         # C[(x-1)%5]
        d_hi = jnp.roll(c_hi, 1) ^ r1_hi
        lo = (g_lo ^ d_lo[None, :]).reshape(25)
        hi = (g_hi ^ d_hi[None, :]).reshape(25)
        # rho + pi (one static gather + static-amount rotations)
        lo, hi = _rotl_pair(lo[pi_src], hi[pi_src], _M32, _SWAP, _MZ)
        # chi: A[x][y] = B[x][y] ^ (~B[x+1][y] & B[x+2][y]); roll over x
        g_lo = lo.reshape(5, 5)
        g_hi = hi.reshape(5, 5)
        b1_lo = jnp.roll(g_lo, -1, axis=1)
        b1_hi = jnp.roll(g_hi, -1, axis=1)
        b2_lo = jnp.roll(g_lo, -2, axis=1)
        b2_hi = jnp.roll(g_hi, -2, axis=1)
        lo = (g_lo ^ (~b1_lo & b2_lo)).reshape(25)
        hi = (g_hi ^ (~b1_hi & b2_hi)).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ _RC_LO[rnd])
        hi = hi.at[0].set(hi[0] ^ _RC_HI[rnd])
    return lo, hi


def pack_lanes(state_bytes):
    """(200,) uint32 byte values -> ((25,) lo, (25,) hi) little-endian."""
    s = state_bytes.reshape(25, 8).astype(jnp.uint32)
    lo = s[:, 0] | (s[:, 1] << 8) | (s[:, 2] << 16) | (s[:, 3] << 24)
    hi = s[:, 4] | (s[:, 5] << 8) | (s[:, 6] << 16) | (s[:, 7] << 24)
    return lo, hi


def unpack_lanes(lo, hi):
    """((25,) lo, (25,) hi) -> (200,) uint32 byte values."""
    parts = [(lo >> (8 * k)) & 0xFF for k in range(4)] + \
            [(hi >> (8 * k)) & 0xFF for k in range(4)]
    return jnp.stack(parts, axis=1).reshape(200)


def keccak_f1600_device(state_bytes):
    """(200,) uint32 byte-valued state -> permuted (200,) uint32."""
    lo, hi = pack_lanes(state_bytes)
    lo, hi = keccak_f1600_lanes(lo, hi)
    return unpack_lanes(lo, hi)
