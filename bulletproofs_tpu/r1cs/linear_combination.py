"""Variable / LinearCombination algebra
(`/root/reference/src/r1cs/linear_combination.rs`).

`Variable` is a tiny frozen record (kind, index) with kinds mirroring the
reference enum (`linear_combination.rs:12-23`): Committed, MultiplierLeft,
MultiplierRight, MultiplierOutput, One.  LinearCombination holds
[(Variable, Scalar)] terms with the same +/-/* operator surface the Rust impl
provides (`linear_combination.rs:113-237`), plus `simplify()`
(`linear_combination.rs:53-67`).
"""

from dataclasses import dataclass

from ..ops.field_host import Scalar

# Variable kinds
COMMITTED = 0
MULT_LEFT = 1
MULT_RIGHT = 2
MULT_OUTPUT = 3
ONE = 4


class Variable:
    """Frozen (kind, index) record with a precomputed hash — Variables key
    the `simplify`/flattening dicts in the constraint-synthesis hot loop
    (millions of hash/eq calls per gadget proof)."""

    __slots__ = ("kind", "index", "_h")

    def __init__(self, kind, index=0):
        self.kind = kind
        self.index = index
        self._h = hash((kind, index))

    def __eq__(self, other):
        return (isinstance(other, Variable) and other.kind == self.kind
                and other.index == self.index)

    def __hash__(self):
        return self._h

    def __repr__(self):
        return f"Variable(kind={self.kind}, index={self.index})"

    @staticmethod
    def committed(i):
        return Variable(COMMITTED, i)

    @staticmethod
    def multiplier_left(i):
        return Variable(MULT_LEFT, i)

    @staticmethod
    def multiplier_right(i):
        return Variable(MULT_RIGHT, i)

    @staticmethod
    def multiplier_output(i):
        return Variable(MULT_OUTPUT, i)

    @staticmethod
    def one():
        return ONE_VAR

    # arithmetic produces LinearCombinations
    def __add__(self, other):
        return LinearCombination.from_var(self) + other

    def __radd__(self, other):
        return _coerce(other) + LinearCombination.from_var(self)

    def __sub__(self, other):
        return LinearCombination.from_var(self) - other

    def __rsub__(self, other):
        return _coerce(other) - LinearCombination.from_var(self)

    def __mul__(self, scalar):
        return LinearCombination([(self, _as_scalar(scalar))])

    __rmul__ = __mul__

    def __neg__(self):
        return -LinearCombination.from_var(self)


ONE_VAR = Variable(ONE, 0)


@dataclass
class AllocatedQuantity:
    """`linear_combination.rs:26-29`: variable plus optional assignment."""
    variable: Variable
    assignment: object = None  # Optional[Scalar]


def _as_scalar(x):
    if isinstance(x, Scalar):
        return x
    if isinstance(x, int):
        return Scalar(x)
    raise TypeError(f"cannot use {type(x)} as scalar coefficient")


def _coerce(x):
    if isinstance(x, LinearCombination):
        return x
    if isinstance(x, Variable):
        return LinearCombination.from_var(x)
    if isinstance(x, (Scalar, int)):
        return LinearCombination([(Variable.one(), _as_scalar(x))])
    raise TypeError(f"cannot coerce {type(x)} to LinearCombination")


class LinearCombination:
    __slots__ = ("terms",)

    def __init__(self, terms=None):
        self.terms = list(terms) if terms else []

    @staticmethod
    def from_var(v: Variable):
        return LinearCombination([(v, Scalar.one())])

    @staticmethod
    def coerce(x):
        return _coerce(x)

    def simplify(self):
        """Combine duplicate variables (`linear_combination.rs:53-67`).
        Accumulates raw ints and re-wraps once per distinct variable — the
        synthesis hot loop calls this thousands of times per gadget."""
        acc = {}
        cvs = {}
        for var, coeff in self.terms:
            if var in acc:
                acc[var] += coeff.v
            else:
                acc[var] = coeff.v
                cvs[var] = coeff.cv
        return LinearCombination(
            [(v, Scalar._new(c % cvs[v].r, cvs[v])) for v, c in acc.items()])

    def __len__(self):
        return len(self.terms)

    def __add__(self, other):
        other = _coerce(other)
        return LinearCombination(self.terms + other.terms)

    __radd__ = __add__

    def __sub__(self, other):
        other = _coerce(other)
        return LinearCombination(
            self.terms
            + [(v, Scalar._new(-c.v % c.cv.r, c.cv)) for v, c in other.terms])

    def __rsub__(self, other):
        return _coerce(other) - self

    def __neg__(self):
        return LinearCombination(
            [(v, Scalar._new(-c.v % c.cv.r, c.cv)) for v, c in self.terms])

    def __mul__(self, scalar):
        s = _as_scalar(scalar).v
        return LinearCombination(
            [(v, Scalar._new(c.v * s % c.cv.r, c.cv)) for v, c in self.terms])

    __rmul__ = __mul__

    def __repr__(self):
        return f"LC({self.terms!r})"
