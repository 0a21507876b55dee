"""Gadget suite: statement builders over the R1CS constraint system
(`/root/reference/src/r1cs/gadgets/`).

Gadget convention (reference `gadgets/README.md:1-5`):
 - `*_gadget`: pure constraint builder over any ConstraintSystem
 - `prove_*` / `verify_*`: composable, take a live Prover/Verifier
 - `gen_proof_*` / `verify_proof_*`: one-shot, own the transcript
"""

from . import bound_check
from . import hamming_distance
from . import helper_constraints
from . import mimc
from . import non_zero
from . import poseidon_hash
from . import randomizer
from . import set_membership
from . import set_membership_alt
from . import set_non_membership
from . import sparse_merkle_tree_4_ary
from . import sparse_merkle_tree_8_ary
