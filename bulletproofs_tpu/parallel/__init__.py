"""Multi-chip sharding: mesh construction and collective MSM/IPA stages.

The reference library is single-threaded with no communication layer
(SURVEY.md section 2.3); this package is the TPU-native scaling axis designed
per the north star: points/scalars sharded over the device mesh, per-chip
Pippenger bucket accumulation, bucket sums reduced with ICI collectives.
"""

from .sharded_msm import make_mesh, msm_sharded, msm_sharded_jit

__all__ = ["make_mesh", "msm_sharded", "msm_sharded_jit"]
