"""Bit constraint (`helper_constraints/bit.rs:7-33`): v in {0, 1}."""

from ...ops.field_host import Scalar
from ...r1cs.linear_combination import LinearCombination


def bit_gadget(cs, v):
    """Allocate (a, b, o) = ((1-v), v, 0); constrain b == v, o == 0,
    a + b == 1."""
    assignment = None
    if v.assignment is not None:
        assignment = (Scalar.one() - v.assignment, v.assignment)
    a, b, o = cs.allocate_multiplier(assignment)

    # b - v == 0
    cs.constrain(b - v.variable)
    # a * b == 0 — one of them is zero
    cs.constrain(LinearCombination.from_var(o))
    # a = 1 - b — both are bits
    cs.constrain(a + (b - Scalar.one()))
    return b
