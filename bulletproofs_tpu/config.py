"""Curve configuration registry.

The reference selects its curve with cargo compile-time features
(`/root/reference/Cargo.toml:22-27`).  Here the curve is a runtime choice: a
`CurveParams` record carries every constant the protocol needs, and a module
level "active curve" (default BLS12-381) plays the role of the cargo default
feature.  All field/EC code receives the params explicitly or reads the active
curve, so both curves can be exercised in a single process.

Limb layout for the TPU backend: little-endian 16-bit limbs stored in uint32
lanes.  16-bit limbs keep every partial product of a schoolbook/Montgomery
multiply below 2**32 with headroom for lazy carry accumulation, which is the
widest exact integer multiply available on the TPU VPU.
"""

from dataclasses import dataclass, field


LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _n_limbs(modulus: int) -> int:
    return (modulus.bit_length() + LIMB_BITS - 1) // LIMB_BITS


@dataclass(frozen=True)
class FieldParams:
    """Constants for one prime field, precomputed for Montgomery arithmetic."""

    modulus: int
    n_limbs: int
    mont_r: int          # R = 2**(LIMB_BITS * n_limbs)
    mont_r2: int         # R^2 mod modulus (to enter Montgomery form)
    mont_one: int        # R mod modulus (Montgomery form of 1)
    n0inv: int           # -modulus^-1 mod 2**LIMB_BITS (CIOS constant)
    n_bits: int

    @staticmethod
    def create(modulus: int) -> "FieldParams":
        n = _n_limbs(modulus)
        r = 1 << (LIMB_BITS * n)
        return FieldParams(
            modulus=modulus,
            n_limbs=n,
            mont_r=r,
            mont_r2=(r * r) % modulus,
            mont_one=r % modulus,
            n0inv=(-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS),
            n_bits=modulus.bit_length(),
        )


@dataclass(frozen=True)
class CurveParams:
    """Everything the protocol needs for one pairing-friendly curve's G1.

    Mirrors the constants the reference pulls from `amcl_wrapper::constants`
    (`MODBYTES`, `CurveOrder`) plus the curve equation/generator that live
    inside AMCL itself.
    """

    name: str
    # Base field F_p and scalar field F_r
    p: int
    r: int
    # Short Weierstrass y^2 = x^3 + a*x + b (a = 0 for the pairing curves
    # and secp256k1; ed25519's Weierstrass form has a != 0)
    b: int
    cofactor: int
    gx: int
    gy: int
    # Serialized byte width of a field element (amcl MODBYTES)
    modbytes: int
    a: int = 0
    # AMCL-Edwards serialization boundary (ed25519 only): when ed_d is set,
    # point bytes / hash-to-curve use TWISTED EDWARDS coordinates
    # (-x^2 + y^2 = 1 + ed_d x^2 y^2, AMCL CURVETYPE EDWARDS semantics)
    # while internal arithmetic stays short-Weierstrass.  mont_A is the
    # Montgomery A (u^2 term) of the intermediate curve; ed_c the fixed
    # sqrt(-(mont_A + 2)) choice that maps the Weierstrass generator to the
    # curve's standard Edwards base point (verified in test_ed25519.py).
    ed_d: int = None
    mont_A: int = None
    ed_c: int = None
    fp: FieldParams = field(default=None)
    fr: FieldParams = field(default=None)

    def __post_init__(self):
        object.__setattr__(self, "fp", FieldParams.create(self.p))
        object.__setattr__(self, "fr", FieldParams.create(self.r))

    @property
    def point_bytes(self) -> int:
        # Uncompressed: 0x04 || x || y, amcl ECP::tobytes layout
        return 2 * self.modbytes + 1


BLS381 = CurveParams(
    name="bls381",
    p=0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    r=0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001,
    b=4,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
    gx=0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    gy=0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    modbytes=48,
)

# AMCL's "BN254" (Nogami); generator is (p-1, 1) on y^2 = x^3 + 2.
BN254 = CurveParams(
    name="bn254",
    p=0x2523648240000001BA344D80000000086121000000000013A700000000000013,
    r=0x2523648240000001BA344D8000000007FF9F800000000010A10000000000000D,
    b=2,
    cofactor=1,
    gx=0x2523648240000001BA344D80000000086121000000000013A700000000000012,
    gy=1,
    modbytes=32,
)

# secp256k1 (reference cargo feature `secp256k1`, `Cargo.toml:22-27`):
# y^2 = x^3 + 7 — also a = 0, so the same complete RCB16 formulas apply.
SECP256K1 = CurveParams(
    name="secp256k1",
    p=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
    r=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    b=7,
    cofactor=1,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
    modbytes=32,
)

# ed25519 (reference cargo feature `ed25519`, `Cargo.toml:27`).  AMCL's
# ed25519 group is the prime-order subgroup of Curve25519; here it is
# represented in short Weierstrass form via the standard birational map from
# the Montgomery curve v^2 = u^3 + 486662 u^2 + u (x = u + A/3, y = v), so
# the same complete projective formulas serve all curves — the a != 0 case
# dispatches to the general RCB16 algorithm 1 instead of the a = 0
# specialization.  Constants below are the mapped A = 486662 values and the
# mapped base point u = 9 (see scripts in git history / NOTES.md):
#   a = 1 - A^2/3,  b = A(2A^2 - 9)/27,  gx = 9 + A/3,  gy = v(9).
ED25519 = CurveParams(
    name="ed25519",
    p=(1 << 255) - 19,
    r=(1 << 252) + 27742317777372353535851937790883648493,
    a=0x2AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA984914A144,
    b=0x7B425ED097B425ED097B425ED097B425ED097B425ED097B4260B5E9C7710C864,
    cofactor=8,
    gx=0x2AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAD245A,
    gy=0x20AE19A1B8A086B4E01EDD2C7748D14C923D4D7E6D7C61B229E9C5A27ECED3D9,
    modbytes=32,
    # AMCL's ed25519 is CURVETYPE EDWARDS: serialization/hash-to-curve use
    # the twisted Edwards form (a = -1, d = -121665/121666) so transcript
    # bytes match the reference's `ed25519` feature (round-4 parity; the
    # round-1..3 Weierstrass byte encoding is retired, AUDIT.md section 6).
    # ed_c^2 = -486664 with the sign fixed so gx/gy above map to the
    # standard base point (x_B, 4/5) — verified in tests/test_ed25519.py.
    ed_d=0x52036CEE2B6FFE738CC740797779E89800700A4D4141D8AB75EB4DCA135978A3,
    mont_A=486662,
    ed_c=0x70D9120B9F5FF9442D84F723FC03B0813A5E2C2EB482E57D3391FB5500BA81E7,
)

CURVES = {"bls381": BLS381, "bn254": BN254, "secp256k1": SECP256K1,
          "ed25519": ED25519}

_active = BLS381


def set_curve(name_or_params) -> CurveParams:
    """Select the active curve (runtime analog of the reference's cargo
    features, `/root/reference/Cargo.toml:22-27`)."""
    global _active
    if isinstance(name_or_params, CurveParams):
        _active = name_or_params
    else:
        _active = CURVES[name_or_params]
    return _active


def curve() -> CurveParams:
    return _active


class using_curve:
    """Context manager: temporarily switch the active curve."""

    def __init__(self, name_or_params):
        self.target = name_or_params
        self.saved = None

    def __enter__(self):
        global _active
        self.saved = _active
        return set_curve(self.target)

    def __exit__(self, *exc):
        set_curve(self.saved)
        return False
