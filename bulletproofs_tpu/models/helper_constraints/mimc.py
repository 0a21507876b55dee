"""MiMC permutation: native evaluation and circuit synthesis
(`/root/reference/src/r1cs/gadgets/helper_constraints/mimc.rs`).

Per round: xl, xr <- (xl + c_i)^3 + xr, xl — two multipliers per round
(square then cube, `mimc.rs:31-77`); output is xl of the last round.
"""

from ...ops.field_host import Scalar
from ...r1cs.linear_combination import LinearCombination, Variable
from . import constrain_lc_with_scalar


def mimc(xl: Scalar, xr: Scalar, constants, mimc_rounds: int) -> Scalar:
    """Native evaluation (`mimc.rs:10-29`)."""
    assert len(constants) == mimc_rounds
    for i in range(mimc_rounds):
        tmp1 = xl + constants[i]
        tmp2 = tmp1.square() * tmp1 + xr
        xr = xl
        xl = tmp2
    return xl


def enforce_mimc_2_inputs(cs, left, right, mimc_rounds: int, constants):
    """Circuit synthesis (`mimc.rs:49-77`); returns the output LC."""
    left_v = LinearCombination.coerce(left)
    right_v = LinearCombination.coerce(right)
    for j in range(mimc_rounds):
        const_lc = LinearCombination([(Variable.one(), constants[j])])
        left_plus_const = left_v + const_lc
        l, _, l_sqr = cs.multiply(left_plus_const,
                                  left_plus_const)
        _, _, l_cube = cs.multiply(LinearCombination.from_var(l_sqr),
                                   LinearCombination.from_var(l))
        tmp = l_cube + right_v
        right_v = left_v
        left_v = tmp
    return left_v


def mimc_gadget(cs, left, right, mimc_rounds: int, constants, image: Scalar):
    """Constrain MiMC(left, right) == image (`mimc.rs:31-47`)."""
    res = enforce_mimc_2_inputs(cs, left.variable, right.variable,
                                mimc_rounds, constants)
    constrain_lc_with_scalar(cs, res, image)
