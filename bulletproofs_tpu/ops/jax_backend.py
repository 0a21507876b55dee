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
    generator sets G, H).  Keyed on the id of the list object AND its length
    (generators are append-only reused lists in practice)."""

    def __init__(self, max_entries=8):
        self.entries = {}
        self.max_entries = max_entries

    def get(self, points, ctx):
        key = (id(points), len(points), ctx.cv.name)
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
        P = ej.to_device_points(points, ctx)
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
