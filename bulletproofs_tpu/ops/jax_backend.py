"""JAX device backend: implements the `backend.py` op interface over the
batched limb kernels (field_jax / ec_jax / msm).

Protocol code hands in host-side `G1`/`Scalar` lists; this adapter converts at
the boundary (generator vectors are conversion-cached since G, H are reused
across every round and proof).  The device-resident IPA keeps vectors on
device across rounds and only crosses this boundary for transcript hashes.
"""

from ..config import curve
from . import ec_jax as ej
from . import msm as msm_mod
from .ec_host import G1


class _ConvCache:
    """Cache host->device conversions of long-lived point vectors (the
    generator sets G, H — reused across every proof and IPA round).

    Keyed on CONTENT, not object identity: length + curve + the projective
    coordinates of three sampled points (first/middle/last).  Generator
    vectors come from hash-to-curve, so sampled coordinates determine the
    whole vector with overwhelming probability; id()-based keys were an
    aliasing hazard after GC (ADVICE.md round 1)."""

    def __init__(self, max_entries=16):
        self.entries = {}
        self.max_entries = max_entries

    @staticmethod
    def _key(points, ctx):
        sample = (points[0], points[len(points) // 2], points[-1])
        return (len(points), ctx.cv.name) + tuple(
            (p.X, p.Y, p.Z) for p in sample)

    def get(self, points, ctx):
        key = self._key(points, ctx)
        hit = self.entries.get(key)
        if hit is not None:
            return hit
        dev = ej.to_device_points(points, ctx)
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

    def msm(self, points, scalars):
        """Sum_i scalars[i] * points[i] -> G1 (device Pippenger)."""
        if not points:
            return G1.identity()
        ctx = self._ctx(points)
        P = self._gen_cache.get(points, ctx)
        s = ej.to_device_scalars(scalars, ctx)
        c = msm_mod.pick_window(len(points))
        out = msm_mod.msm_device(P, s, ctx, c)
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
