"""Compute kernels: host (Python-int ground truth) and device (JAX/Pallas
limb kernels) implementations of field, EC, MSM and hash primitives."""
