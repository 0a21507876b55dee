"""Sum of a vector of variables equals a public value
(`helper_constraints/vector_sum.rs:6-19`)."""

from ...ops.field_host import Scalar
from ...r1cs.linear_combination import LinearCombination, Variable


def vector_sum_constraints(cs, variables, total: int):
    terms = [(Variable.one(), -Scalar(total))]
    for v in variables:
        terms.append((v, Scalar.one()))
    cs.constrain(LinearCombination(terms))
