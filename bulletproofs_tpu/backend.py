"""Compute backend dispatch.

Protocol code (ipp.py, r1cs/) is written against this small interface so the
same code runs on the exact host backend (Python ints — ground truth) or the
TPU backend (batched limb kernels under jit, ops/{field_jax,ec_jax,msm}.py).

The default is "auto": device for O(n) vector work above a size threshold,
host for tiny sizes where dispatch overhead dominates.
"""

import os

from .ops import ec_host
from .ops.field_host import Scalar


class HostBackend:
    """Exact Python-int backend; also the ground truth for device tests."""

    name = "host"

    def msm(self, points, scalars, ct=False):
        """Sum_i scalars[i] * points[i] -> G1.

        ct is accepted for interface parity and ignored: the exact-int
        backend is the testing ground truth, never the production path for
        secret data (big-int Python arithmetic is inherently value-
        dependent in time)."""
        return ec_host.msm_host(points, scalars)

    def msm_multi(self, points, scalar_sets, ct=False):
        """k MSMs over one table (interface parity with CppBackend)."""
        return [ec_host.msm_host(points, s) for s in scalar_sets]

    def fold_points(self, P_L, P_R, s1, s2):
        """[s1[i]*P_L[i] + s2[i]*P_R[i]] — the IPA basis fold
        (`ipp.rs:115-130`). s1/s2 may be lists or broadcast Scalars."""
        n = len(P_L)
        s1 = s1 if isinstance(s1, (list, tuple)) else [s1] * n
        s2 = s2 if isinstance(s2, (list, tuple)) else [s2] * n
        return [p.binary_scalar_mul(q, a, b)
                for p, q, a, b in zip(P_L, P_R, s1, s2)]

    def scalar_mul_batch(self, points, scalars):
        """[scalars[i] * points[i]] elementwise."""
        return [p * s for p, s in zip(points, scalars)]


_backends = {"host": HostBackend()}
_mode = os.environ.get("BP_BACKEND", "auto")
# Below this vector length the host backend wins (device dispatch overhead).
DEVICE_THRESHOLD = int(os.environ.get("BP_DEVICE_THRESHOLD", "16384"))


def register_backend(name, backend):
    _backends[name] = backend


def set_backend(mode: str):
    """'host', 'cpp', 'jax', or 'auto'."""
    global _mode
    _mode = mode


def get_backend(size_hint: int = 1 << 30):
    """Pick the backend for an op over vectors of length `size_hint`.

    auto: TPU device for long vectors (throughput), native C++ below the
    device threshold (latency), exact Python ints as the last resort."""
    if _mode == "host":
        return _backends["host"]
    if _mode == "cpp":
        return _lazy_cpp() or _backends["host"]
    if _mode == "jax":
        return _lazy_jax() or _backends["host"]
    # auto
    if size_hint >= DEVICE_THRESHOLD:
        be = _lazy_jax()
        if be is not None:
            return be
    return _lazy_cpp() or _backends["host"]


def _axon_alive():
    """Probe a REMOTE jax platform (the axon TPU tunnel) in a subprocess
    before the first device dispatch: a downed tunnel hangs jax backend
    init forever with no timeout, which would hang any auto-policy op at
    n >= DEVICE_THRESHOLD.  Local platforms (cpu under tests, tpu
    directly attached) skip the probe.  The verdict is cached in a file
    with a 10-minute TTL so one probe (~8 s of jax import in the child)
    serves every process on the machine."""
    import subprocess
    import sys
    import time

    try:
        import jax
        plat = str(getattr(jax.config, "jax_platforms", None)
                   or os.environ.get("JAX_PLATFORMS", ""))
    except Exception:
        return False
    if "axon" not in plat:
        return True
    cache = os.path.join(os.environ.get("TMPDIR", "/tmp"),
                         "bp_axon_probe")
    try:
        st = os.stat(cache)
        if time.time() - st.st_mtime < 600:
            with open(cache) as f:
                return f.read().strip() == "up"
    except OSError:
        pass
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d[0].platform != 'cpu'"],
            capture_output=True, timeout=120)   # live-tunnel init ~20-40 s
        ok = r.returncode == 0
    except Exception:
        ok = False
    try:
        with open(cache, "w") as f:
            f.write("up" if ok else "down")
    except OSError:
        pass
    return ok


def _lazy_jax():
    if "jax" not in _backends:
        try:
            if not _axon_alive():
                raise RuntimeError("axon tunnel down (probe)")
            from .ops.jax_backend import JaxBackend
            _backends["jax"] = JaxBackend()
        except Exception:
            _backends["jax"] = None
    return _backends["jax"]


def _lazy_cpp():
    if "cpp" not in _backends:
        try:
            from .ops.cpp_backend import CppBackend, get_lib
            get_lib()
            _backends["cpp"] = CppBackend()
        except Exception:
            _backends["cpp"] = None
    return _backends["cpp"]
