"""Gadget suite: statement builders over the R1CS constraint system
(`/root/reference/src/r1cs/gadgets/`).

Gadget convention (reference `gadgets/README.md:1-5`):
 - `*_gadget`: pure constraint builder over any ConstraintSystem
 - `prove_*` / `verify_*`: composable, take a live Prover/Verifier
 - `gen_proof_*` / `verify_proof_*`: one-shot, own the transcript
"""

from . import bound_check
from . import helper_constraints
from . import mimc
from . import non_zero
from . import set_membership
from . import set_membership_alt
from . import set_non_membership
