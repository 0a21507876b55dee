"""Gadget suite: statement builders over the R1CS constraint system
(`/root/reference/src/r1cs/gadgets/`)."""

from . import bound_check
from . import helper_constraints
