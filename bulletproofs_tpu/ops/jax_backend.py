"""JAX device backend: implements the `backend.py` op interface over the
batched limb kernels (field_jax / ec_jax / msm).

Protocol code hands in host-side `G1`/`Scalar` lists; this adapter converts at
the boundary (generator vectors are conversion-cached since G, H are reused
across every round and proof).  The device-resident IPA keeps vectors on
device across rounds and only crosses this boundary for transcript hashes.
"""

import hashlib

from ..config import curve
from . import ec_jax as ej
from . import msm as msm_mod
from .ec_host import G1


def content_digest(points, ctx):
    """Collision-resistant digest of a point vector's FULL projective
    content (curve + length + every X/Y/Z coordinate).

    Sampled-coordinate keys were an aliasing hazard when any cached list
    could contain adversary-chosen points (ADVICE.md round 2, high): a
    second proof matching the sampled points would reuse the first
    proof's converted table, breaking Fiat-Shamir binding.  blake2b over
    ~9 MB (n=2^16) costs ~10 ms — negligible vs the ~ms/point host->device
    conversion it saves."""
    h = hashlib.blake2b(digest_size=16)
    nb = (ctx.cv.p.bit_length() + 7) // 8
    h.update(ctx.cv.name.encode())
    h.update(len(points).to_bytes(8, "little"))
    for p in points:
        h.update(p.X.to_bytes(nb, "little"))
        h.update(p.Y.to_bytes(nb, "little"))
        h.update(p.Z.to_bytes(nb, "little"))
    return h.digest()


class _ConvCache:
    """Cache host->device conversions of long-lived point vectors (the
    generator sets G, H — reused across every proof and IPA round).

    Keyed on a blake2b digest of the FULL coordinate content (see
    `content_digest`), so mixed generator+proof-supplied lists (the
    verifier mega-MSMs) are safe to cache too: any list differing in any
    coordinate gets its own entry."""

    def __init__(self, max_entries=16):
        self.entries = {}
        self.max_entries = max_entries

    def get(self, points, ctx):
        """Returns (device_array, is_affine) — affine tables qualify for
        the mixed-add bucket kernel (ops/ec_pallas)."""
        key = content_digest(points, ctx)
        hit = self.entries.get(key)
        if hit is not None:
            return hit
        dev = ej.to_device_points_affine(points, ctx)
        if len(self.entries) >= self.max_entries:
            self.entries.clear()
        self.entries[key] = dev
        return dev


class JaxBackend:
    name = "jax"

    def __init__(self):
        self._gen_cache = _ConvCache()

    def _ctx(self, points):
        cv = points[0].cv if points else curve()
        return ej.CurveCtx(cv)

    def msm(self, points, scalars, ct=False):
        """Sum_i scalars[i] * points[i] -> G1 (device Pippenger).

        ct is accepted for interface parity: the device schedule is already
        input-independent up to the rare overflow re-dispatch — the static
        round count comes from `occupancy_guess` (a function of n only) and
        the per-shape escalation memo, never from a scan of the scalars
        (AUDIT.md "Side-channel posture")."""
        if not points:
            return G1.identity()
        ctx = self._ctx(points)
        P, affine = self._gen_cache.get(points, ctx)
        s = ej.to_device_scalars(scalars, ctx)
        c = msm_mod.pick_window(len(points))
        out = msm_mod.msm_device(P, s, ctx, c, affine=affine)
        return ej.from_device_points(out, ctx)[0]

    def fold_points(self, P_L, P_R, s1, s2):
        """[s1[i]*P_L[i] + s2[i]*P_R[i]] — batched Straus ladder."""
        n = len(P_L)
        ctx = self._ctx(P_L)
        s1 = s1 if isinstance(s1, (list, tuple)) else [s1] * n
        s2 = s2 if isinstance(s2, (list, tuple)) else [s2] * n
        out = ej.ec_pair_fold(ej.to_device_points(P_L, ctx),
                              ej.to_device_points(P_R, ctx),
                              ej.to_device_scalars(s1, ctx),
                              ej.to_device_scalars(s2, ctx), ctx)
        return ej.from_device_points(out, ctx)

    def scalar_mul_batch(self, points, scalars):
        ctx = self._ctx(points)
        out = ej.ec_scalar_mul(ej.to_device_points(points, ctx),
                               ej.to_device_scalars(scalars, ctx), ctx)
        return ej.from_device_points(out, ctx)
