"""bulletproofs_tpu: a TPU-native Bulletproofs framework.

A from-scratch JAX / XLA / Pallas implementation of the Bulletproofs
zero-knowledge proof system (inner-product argument + R1CS constraint-system
proofs with a gadget suite) over BLS12-381 / BN254, with the same capabilities
as the reference Rust library `lovesh/bulletproofs-amcl` but designed
TPU-first:

 - field/EC arithmetic as batched 16-bit-limb uint32 kernels (Montgomery)
 - MSMs as vectorized Pippenger (sort + EC prefix-scan), shardable over a
   device mesh with collective bucket reduction
 - IPA folds as batched on-device ladders
 - byte-exact merlin (STROBE-128/keccak-f[1600]) Fiat-Shamir transcripts on
   the host

Layout:  ops/ (field, EC, MSM, hash kernels; host + device backends),
r1cs/ (constraint system, prover, verifier), models/ (gadget suite),
parallel/ (mesh sharding), transcript/, utils/.
"""

from . import config
from .config import curve, set_curve, using_curve, BLS381, BN254
from .backend import set_backend, get_backend
from .ops.field_host import Scalar
from .ops.ec_host import G1
from .transcript import ProofTranscript, Transcript
from .utils import get_generators
from .ipp import (InnerProductArgumentProof, batch_verify_ipp, create_ipp,
                  verify_ipp)
from .r1cs import (Prover, Verifier, R1CSProof, Variable, LinearCombination,
                   AllocatedQuantity, ConstraintSystem, batch_verify)

__version__ = "0.1.0"
