"""Binary-decomposition range constraint (`helper_constraints/positive_no.rs`):
v in [0, 2^n).  This is the core of range proofs in this framework
(via the bound_check gadget)."""

from ...ops.field_host import Scalar
from ...r1cs.linear_combination import LinearCombination


def positive_no_gadget(cs, v, n: int):
    """n bit gadgets plus sum(b_i * 2^i) == v."""
    constraint_v = [(v.variable, Scalar.minus_one())]
    exp_2 = Scalar.one()
    for i in range(n):
        assignment = None
        if v.assignment is not None:
            if v.assignment.shift_right(i).is_odd():
                assignment = (Scalar.zero(), Scalar.one())
            else:
                assignment = (Scalar.one(), Scalar.zero())
        a, b, o = cs.allocate_multiplier(assignment)

        # a * b = 0
        cs.constrain(LinearCombination.from_var(o))
        # a = 1 - b
        cs.constrain(a + (b - Scalar.one()))

        constraint_v.append((b, exp_2))
        exp_2 = exp_2 + exp_2

    # -v + sum(b_i * 2^i) = 0
    cs.constrain(LinearCombination(constraint_v))
