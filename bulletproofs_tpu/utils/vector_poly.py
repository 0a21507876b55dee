"""Vector polynomials for the t(x) construction
(`/root/reference/src/utils/vector_poly.rs`).

VecPoly1/Poly2 exist for API parity; the prover path uses VecPoly3's
`special_inner_product` (l.0 == 0 and r.2 == 0, so t0 == t2-term structure
collapses to a Poly6 with no t0, `vector_poly.rs:79-97`).

These run on the host over Scalar lists; the device prover path evaluates the
same polynomials with batched limb kernels instead (ops/prover_device.py).
"""

from ..ops.field_host import Scalar, inner_product


class VecPoly1:
    """A + B*x"""

    def __init__(self, n):
        self.c = [[Scalar.zero() for _ in range(n)] for _ in range(2)]

    def inner_product(self, rhs):
        """Karatsuba (`vector_poly.rs:36-53`)."""
        l, r = self.c, rhs.c
        t0 = inner_product(l[0], r[0])
        t2 = inner_product(l[1], r[1])
        l01 = [a + b for a, b in zip(l[0], l[1])]
        r01 = [a + b for a, b in zip(r[0], r[1])]
        t1 = inner_product(l01, r01) - (t0 + t2)
        return Poly2(t0, t1, t2)

    def eval(self, x):
        return [a + b * x for a, b in zip(self.c[0], self.c[1])]


class VecPoly3:
    """A + B*x + C*x^2 + D*x^3 (coefficients are vectors)."""

    def __init__(self, n):
        self.c = [[Scalar.zero() for _ in range(n)] for _ in range(4)]

    @staticmethod
    def special_inner_product(l, r):
        """<l(x), r(x)> exploiting l.0 == 0 and r.2 == 0
        (`vector_poly.rs:79-97`)."""
        t1 = inner_product(l.c[1], r.c[0])
        t2 = inner_product(l.c[1], r.c[1]) + inner_product(l.c[2], r.c[0])
        t3 = inner_product(l.c[2], r.c[1]) + inner_product(l.c[3], r.c[0])
        t4 = inner_product(l.c[1], r.c[3]) + inner_product(l.c[3], r.c[1])
        t5 = inner_product(l.c[2], r.c[3])
        t6 = inner_product(l.c[3], r.c[3])
        return Poly6(t1, t2, t3, t4, t5, t6)

    def eval(self, x):
        return [c0 + x * (c1 + x * (c2 + x * c3))
                for c0, c1, c2, c3 in zip(*self.c)]


class Poly2:
    def __init__(self, a, b, c):
        self.coeffs = (a, b, c)

    def eval(self, x):
        a, b, c = self.coeffs
        return a + x * (b + x * c)


class Poly6:
    """t1*x + ... + t6*x^6 (no constant term), `vector_poly.rs:22-29`."""

    def __init__(self, t1, t2, t3, t4, t5, t6):
        self.t1, self.t2, self.t3 = t1, t2, t3
        self.t4, self.t5, self.t6 = t4, t5, t6

    def eval(self, x):
        return x * (self.t1 + x * (self.t2 + x * (self.t3 + x * (
            self.t4 + x * (self.t5 + x * self.t6)))))
