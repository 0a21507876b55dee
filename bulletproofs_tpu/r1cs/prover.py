"""R1CS Prover (`/root/reference/src/r1cs/prover.rs`).

Protocol-faithful: identical transcript schedule, commitment structure,
blinding schedule and padding semantics as `prover.rs:322-593`.  Circuit
construction (constraints, witness growth) is host-side and dynamic; all O(n)
vector/EC math — the three phase-1 MSMs (`prover.rs:336-366`), phase-2 MSMs,
the t-poly inner products and the IPA — dispatches through the backend to
batched TPU kernels when n is large.

Determinism: every random blinding draws from an injectable `rng` (defaults to
a CSPRNG), the analog of the reference gadget drivers' explicit `randomness`
arguments (`gadgets/README.md:3`) extended to the prover core so whole proofs
are reproducible for testing.
"""

import os

from .. import ipp as ipp_mod
from ..backend import get_backend
from ..ops.field_host import (Scalar, inner_product, random_scalars,
                              vandermonde_vector)
from ..ops.ec_host import commit_to_field_element
from ..utils.errors import InvalidGeneratorsLength, MissingAssignment
from ..utils.vector_poly import Poly6, VecPoly3
from .constraint_system import ConstraintSystem, RandomizedConstraintSystem
from .linear_combination import (COMMITTED, MULT_LEFT, MULT_OUTPUT, MULT_RIGHT,
                                 ONE, LinearCombination, Variable)
from .proof import R1CSProof


def _next_power_of_two(n):
    return 1 if n == 0 else 1 << (n - 1).bit_length()


class Prover(ConstraintSystem):
    def __init__(self, g, h, transcript, rng=None):
        transcript.r1cs_domain_sep()
        self.g = g
        self.h = h
        self.transcript = transcript
        self.rng = rng
        self.constraints = []
        self.a_L = []
        self.a_R = []
        self.a_O = []
        self.v = []
        self.v_blinding = []
        self.deferred_constraints = []
        self.pending_multiplier = None

    # ---- commitments ----
    def commit(self, v, v_blinding):
        """Pedersen-commit a high-level variable (`prover.rs:119-129`).
        Routed through the backend's fold (g*v + h*r): the native x8
        engine does this in ~0.6 ms vs ~16 ms of Python ladders — m
        commitments precede every aggregated proof."""
        if isinstance(v, int):
            v = Scalar(v)
        i = len(self.v)
        be = get_backend(2)
        if hasattr(be, "fold_points"):
            (V,) = be.fold_points([self.g], [self.h], [v], [v_blinding])
        else:
            V = commit_to_field_element(self.g, self.h, v, v_blinding)
        self.v.append(v)
        self.v_blinding.append(v_blinding)
        self.transcript.commit_point(b"V", V)
        return V, Variable.committed(i)

    def commit_many(self, vals, blindings):
        """Batch Pedersen commits: same values, transcript order and rng
        contract as sequential `commit` calls (proofs byte-identical), but
        all g^v h^r folds ride ONE native x8 two-scalar fold — the 1-output
        fold ladder costs ~0.9 ms while an 8-lane group costs about the
        same for 8 (gadgets like bound_check commit 3 values back-to-back,
        `bound_check.rs:41-92`)."""
        vals = [Scalar(v) if isinstance(v, int) else v for v in vals]
        blindings = list(blindings)
        i0 = len(self.v)
        be = get_backend(2)
        if hasattr(be, "fold_points") and len(vals) > 1:
            k = len(vals)
            Vs = be.fold_points([self.g] * k, [self.h] * k, vals, blindings)
        else:
            Vs = [commit_to_field_element(self.g, self.h, v, r_)
                  for v, r_ in zip(vals, blindings)]
        out = []
        for k, (v, r_, V) in enumerate(zip(vals, blindings, Vs)):
            self.v.append(v)
            self.v_blinding.append(r_)
            self.transcript.commit_point(b"V", V)
            out.append((V, Variable.committed(i0 + k)))
        return out

    # ---- constraint system ----
    def eval(self, lc: LinearCombination) -> Scalar:
        r = self.g.cv.r
        total = 0
        for var, coeff in lc.terms:
            k = var.kind
            if k == MULT_LEFT:
                val = self.a_L[var.index].v
            elif k == MULT_RIGHT:
                val = self.a_R[var.index].v
            elif k == MULT_OUTPUT:
                val = self.a_O[var.index].v
            elif k == COMMITTED:
                val = self.v[var.index].v
            else:  # ONE
                val = 1
            total += coeff * val
        return Scalar(total % r)

    def _allocate_vars(self, l, r, o):
        lv = Variable.multiplier_left(len(self.a_L))
        rv = Variable.multiplier_right(len(self.a_R))
        ov = Variable.multiplier_output(len(self.a_O))
        self.a_L.append(l)
        self.a_R.append(r)
        self.a_O.append(o)
        return lv, rv, ov

    def multiply(self, left, right):
        left = LinearCombination.coerce(left)
        right = LinearCombination.coerce(right)
        l = self.eval(left)
        r = self.eval(right)
        o = l * r
        l_var, r_var, o_var = self._allocate_vars(l, r, o)
        # terms match `left - l_var` / `right - r_var` exactly; built raw
        # — multiply is the constraint-synthesis hot call (3 per s-box)
        m1 = self.g.cv.r - 1
        self.constraints.append(
            LinearCombination._new(left.terms + [(l_var, m1)]))
        self.constraints.append(
            LinearCombination._new(right.terms + [(r_var, m1)]))
        return l_var, r_var, o_var

    def allocate(self, assignment=None):
        if assignment is None:
            raise MissingAssignment()
        scalar = assignment if isinstance(assignment, Scalar) \
            else Scalar(assignment)
        if self.pending_multiplier is None:
            i = len(self.a_L)
            self.pending_multiplier = i
            self.a_L.append(scalar)
            self.a_R.append(Scalar.zero())
            self.a_O.append(Scalar.zero())
            return Variable.multiplier_left(i)
        i = self.pending_multiplier
        self.pending_multiplier = None
        self.a_R[i] = scalar
        self.a_O[i] = self.a_L[i] * scalar
        return Variable.multiplier_right(i)

    def allocate_multiplier(self, input_assignments=None):
        if input_assignments is None:
            raise MissingAssignment()
        l, r = input_assignments
        return self._allocate_vars(l, r, l * r)

    def constrain(self, lc):
        self.constraints.append(LinearCombination.coerce(lc))

    def specify_randomized_constraints(self, callback):
        self.deferred_constraints.append(callback)

    def evaluate_lc(self, lc):
        return self.eval(lc)

    def num_constraints(self):
        return len(self.constraints)

    def num_multipliers(self):
        return len(self.a_O)

    # ---- proving ----
    def _flattened_constraints(self, z):
        """Fold constraint rows with powers z^(q+1) into wL/wR/wO/wV
        (`prover.rs:142-184`). Streaming (no explicit weight matrices)."""
        r = self.g.cv.r
        n = len(self.a_L)
        m = len(self.v)
        wL = [0] * n
        wR = [0] * n
        wO = [0] * n
        wV = [0] * m
        exp_z = z.v
        zv = z.v
        for lc in self.constraints:
            for var, coeff in lc.terms:
                k = var.kind
                if k == MULT_LEFT:
                    wL[var.index] = (wL[var.index] + exp_z * coeff) % r
                elif k == MULT_RIGHT:
                    wR[var.index] = (wR[var.index] + exp_z * coeff) % r
                elif k == MULT_OUTPUT:
                    wO[var.index] = (wO[var.index] + exp_z * coeff) % r
                elif k == COMMITTED:
                    wV[var.index] = (wV[var.index] - exp_z * coeff) % r
                # ONE: prover skips constant terms
            exp_z = exp_z * zv % r
        return ([Scalar(x) for x in wL], [Scalar(x) for x in wR],
                [Scalar(x) for x in wO], [Scalar(x) for x in wV])

    # ---- debug-only explicit weight-matrix path (`prover.rs:186-281`) ----
    def get_weight_matrices(self):
        """O(q*n) explicit WL/WR/WO/WV matrices; debugging cross-check for
        the streaming `_flattened_constraints`.  Mirrors the reference's
        last-write-wins per-row semantics (`prover.rs:188-231`)."""
        n, m, q = len(self.a_L), len(self.v), len(self.constraints)
        zero = Scalar.zero()
        WL = [[zero] * n for _ in range(q)]
        WR = [[zero] * n for _ in range(q)]
        WO = [[zero] * n for _ in range(q)]
        WV = [[zero] * m for _ in range(q)]
        for r_i, lc in enumerate(self.constraints):
            for var, coeff in lc.terms:
                k = var.kind
                if k == MULT_LEFT:
                    WL[r_i][var.index] = Scalar(coeff)
                elif k == MULT_RIGHT:
                    WR[r_i][var.index] = Scalar(coeff)
                elif k == MULT_OUTPUT:
                    WO[r_i][var.index] = Scalar(coeff)
                elif k == COMMITTED:
                    WV[r_i][var.index] = Scalar(coeff)
        return WL, WR, WO, WV

    def flattened_constraints_elaborated(self, z):
        """Debug: z-fold via the explicit matrices (`prover.rs:233-281`)."""
        WL, WR, WO, WV = self.get_weight_matrices()
        q = len(self.constraints)
        z_exp = vandermonde_vector(z, q + 1)[1:]
        minus_z_exp = [-e for e in z_exp]

        def row_times_matrix(row, M, width):
            return [inner_product(row, [M[r][c] for r in range(q)])
                    for c in range(width)]

        n, m = len(self.a_L), len(self.v)
        return (row_times_matrix(z_exp, WL, n),
                row_times_matrix(z_exp, WR, n),
                row_times_matrix(z_exp, WO, n),
                row_times_matrix(minus_z_exp, WV, m))

    def _create_randomized_constraints(self):
        """`prover.rs:300-319`"""
        self.pending_multiplier = None
        if not self.deferred_constraints:
            self.transcript.r1cs_1phase_domain_sep()
        else:
            self.transcript.r1cs_2phase_domain_sep()
            callbacks, self.deferred_constraints = \
                self.deferred_constraints, []
            wrapped = RandomizingProver(self)
            for cb in callbacks:
                cb(wrapped)

    def prove(self, G, H) -> R1CSProof:
        """`prover.rs:322-593`"""
        from ..utils.metrics import metrics
        metrics.incr("prove_calls")
        metrics.incr("multipliers", self.num_multipliers())
        metrics.incr("constraints", self.num_constraints())
        with metrics.span("prove"):
            from ..ops import prover_device
            if prover_device.device_prove_available(len(self.a_L)):
                return prover_device.prove_device(self, G, H)
            return self._prove(G, H)

    def _prove(self, G, H) -> R1CSProof:
        tr = self.transcript
        rng = self.rng
        tr.append_u64(b"m", len(self.v))

        n1 = len(self.a_L)
        if len(G) < n1:
            raise InvalidGeneratorsLength()

        i_blinding1 = Scalar.random(rng)
        o_blinding1 = Scalar.random(rng)
        s_blinding1 = Scalar.random(rng)
        s_L1 = random_scalars(n1, rng)
        s_R1 = random_scalars(n1, rng)

        G_n1, H_n1 = G[:n1], H[:n1]
        be = get_backend(2 * n1 + 1)
        # Witness commitments run the constant-WORK MSM core by default
        # (BP_MSM_CT=0 opts out): the scalars are the secret assignment
        # vectors, exactly where the reference switches to
        # `inner_product_const_time` (`prover.rs:358,423`; posture in
        # AUDIT.md).  Proof bytes are identical either way.
        ct = os.environ.get("BP_MSM_CT", "1") != "0"
        # A_I = <a_L, G> + <a_R, H> + i_blinding * h   [prover.rs:347-355]
        # A_O = <a_O, G> + o_blinding * h
        # S = <s_L, G> + <s_R, H> + s_blinding * h
        if hasattr(be, "msm_multi"):
            # one shared [G | H | h] table: point normalization/psi prep is
            # the dominant per-point cost and is paid once for all three
            A_I1, A_O1, S1 = be.msm_multi(
                G_n1 + H_n1 + [self.h],
                [self.a_L + self.a_R + [i_blinding1],
                 self.a_O + [0] * n1 + [o_blinding1],
                 s_L1 + s_R1 + [s_blinding1]], ct=ct)
        else:
            A_I1 = be.msm(G_n1 + H_n1 + [self.h],
                          self.a_L + self.a_R + [i_blinding1], ct=ct)
            A_O1 = be.msm(G_n1 + [self.h], self.a_O + [o_blinding1], ct=ct)
            S1 = be.msm(G_n1 + H_n1 + [self.h],
                        s_L1 + s_R1 + [s_blinding1], ct=ct)

        tr.commit_point(b"A_I1", A_I1)
        tr.commit_point(b"A_O1", A_O1)
        tr.commit_point(b"S1", S1)

        self._create_randomized_constraints()

        n = len(self.a_L)
        n2 = n - n1
        padded_n = _next_power_of_two(n)
        pad = padded_n - n
        if len(G) < padded_n:
            raise InvalidGeneratorsLength()

        has_phase2 = n2 > 0
        if has_phase2:
            i_blinding2 = Scalar.random(rng)
            o_blinding2 = Scalar.random(rng)
            s_blinding2 = Scalar.random(rng)
        else:
            i_blinding2 = o_blinding2 = s_blinding2 = Scalar.zero()
        s_L2 = random_scalars(n2, rng)
        s_R2 = random_scalars(n2, rng)

        if has_phase2:
            G_n2, H_n2 = G[n1:n], H[n1:n]
            be2 = get_backend(2 * n2 + 1)
            if hasattr(be2, "msm_multi"):
                A_I2, A_O2, S2 = be2.msm_multi(
                    G_n2 + H_n2 + [self.h],
                    [self.a_L[n1:] + self.a_R[n1:] + [i_blinding2],
                     self.a_O[n1:] + [0] * n2 + [o_blinding2],
                     s_L2 + s_R2 + [s_blinding2]], ct=ct)
            else:
                A_I2 = be2.msm(G_n2 + H_n2 + [self.h],
                               self.a_L[n1:] + self.a_R[n1:]
                               + [i_blinding2], ct=ct)
                A_O2 = be2.msm(G_n2 + [self.h],
                               self.a_O[n1:] + [o_blinding2], ct=ct)
                S2 = be2.msm(G_n2 + H_n2 + [self.h],
                             s_L2 + s_R2 + [s_blinding2], ct=ct)
        else:
            ident = type(self.g).identity(self.g.cv)
            A_I2 = A_O2 = S2 = ident

        tr.commit_point(b"A_I2", A_I2)
        tr.commit_point(b"A_O2", A_O2)
        tr.commit_point(b"S2", S2)

        y = tr.challenge_scalar(b"y")
        z = tr.challenge_scalar(b"z")

        wL, wR, wO, wV = self._flattened_constraints(z)

        # l(x), r(x) degree-3 vector polynomials and the special inner
        # product t(x) = <l(x), r(x)>  [prover.rs:458-486, 488]
        y_inv = y.inverse()
        exp_y_inv = vandermonde_vector(y_inv, padded_n)
        sL = s_L1 + s_L2
        sR = s_R1 + s_R2
        be_ipa = get_backend(padded_n)
        native_polys = (n > 0 and padded_n >= 2
                        and getattr(be_ipa, "name", "") == "cpp"
                        and os.environ.get("BP_NATIVE_POLYS", "1") != "0")
        if native_polys:
            # one native pass over plain-limb buffers (bp_prove_polys_t)
            # instead of ~10n Python Scalar ops; bit-identical values
            from ..ops import cpp_backend as _cb
            cv = self.g.cv
            t_ints, polys_scratch = _cb.prove_polys_t(
                self.a_L, self.a_R, self.a_O, sL, sR, wL, wR, wO,
                y, y_inv, cv)
            t_poly = Poly6(*[Scalar(v, cv) for v in t_ints])
        else:
            l_poly = VecPoly3(n)
            r_poly = VecPoly3(n)
            exp_y = Scalar.one()
            for i in range(n):
                l_poly.c[1][i] = self.a_L[i] + exp_y_inv[i] * wR[i]
                l_poly.c[2][i] = self.a_O[i]
                l_poly.c[3][i] = sL[i]
                r_poly.c[0][i] = wO[i] - exp_y
                r_poly.c[1][i] = exp_y * self.a_R[i] + wL[i]
                r_poly.c[3][i] = exp_y * sR[i]
                exp_y = exp_y * y
            t_poly = VecPoly3.special_inner_product(l_poly, r_poly)

        t_1_blinding = Scalar.random(rng)
        t_3_blinding = Scalar.random(rng)
        t_4_blinding = Scalar.random(rng)
        t_5_blinding = Scalar.random(rng)
        t_6_blinding = Scalar.random(rng)

        be = get_backend(10)
        if hasattr(be, "fold_points"):
            # one batched native two-scalar fold for all five T_i Pedersen
            # commitments (g^t h^b each) instead of five Python ladders
            T_1, T_3, T_4, T_5, T_6 = be.fold_points(
                [self.g] * 5, [self.h] * 5,
                [t_poly.t1, t_poly.t3, t_poly.t4, t_poly.t5, t_poly.t6],
                [t_1_blinding, t_3_blinding, t_4_blinding, t_5_blinding,
                 t_6_blinding])
        else:
            T_1 = commit_to_field_element(self.g, self.h, t_poly.t1,
                                          t_1_blinding)
            T_3 = commit_to_field_element(self.g, self.h, t_poly.t3,
                                          t_3_blinding)
            T_4 = commit_to_field_element(self.g, self.h, t_poly.t4,
                                          t_4_blinding)
            T_5 = commit_to_field_element(self.g, self.h, t_poly.t5,
                                          t_5_blinding)
            T_6 = commit_to_field_element(self.g, self.h, t_poly.t6,
                                          t_6_blinding)

        tr.commit_point(b"T_1", T_1)
        tr.commit_point(b"T_3", T_3)
        tr.commit_point(b"T_4", T_4)
        tr.commit_point(b"T_5", T_5)
        tr.commit_point(b"T_6", T_6)

        u = tr.challenge_scalar(b"u")
        x = tr.challenge_scalar(b"x")

        # T_2 commitment is synthesized from the V's: t_2_blinding = <wV, v~>
        t_2_blinding = inner_product(wV, self.v_blinding)
        t_blinding_poly = Poly6(t_1_blinding, t_2_blinding, t_3_blinding,
                                t_4_blinding, t_5_blinding, t_6_blinding)

        t_x = t_poly.eval(x)
        t_x_blinding = t_blinding_poly.eval(x)
        if native_polys:
            # l(x)/r(x) straight into plain-limb buffers, incl. the -y^i
            # padding rows [prover.rs:530-535] (bp_prove_polys_eval)
            l_vec, r_vec = _cb.prove_polys_eval(
                polys_scratch, self.a_O, sL, x, y, n, padded_n, cv)
        else:
            l_vec = l_poly.eval(x) + [Scalar.zero()] * pad
            r_vec = r_poly.eval(x)
            # r_poly has -y^i constant terms even in the padding
            # [prover.rs:530-535]
            for _ in range(n, padded_n):
                r_vec.append(-exp_y)
                exp_y = exp_y * y

        i_blinding = i_blinding1 + u * i_blinding2
        o_blinding = o_blinding1 + u * o_blinding2
        s_blinding = s_blinding1 + u * s_blinding2
        e_blinding = x * (i_blinding + x * (o_blinding + x * s_blinding))

        tr.commit_scalar(b"t_x", t_x)
        tr.commit_scalar(b"t_x_blinding", t_x_blinding)
        tr.commit_scalar(b"e_blinding", e_blinding)

        w = tr.challenge_scalar(b"w")
        if hasattr(be, "scalar_mul_batch"):
            (Q,) = be.scalar_mul_batch([self.g], [w])
        else:
            Q = self.g * w

        one = Scalar.one()
        G_factors = [one] * n1 + [u] * (n2 + pad)
        H_factors = [yi * uf for yi, uf in zip(exp_y_inv, G_factors)]

        if native_polys:
            # l_vec/r_vec are already native plain-limb buffers — feed the
            # native round loop directly (same transcript schedule as
            # ipp.create_ipp's cpp path, which would be chosen anyway)
            L_v, R_v, a_fin, b_fin = _cb.create_ipp_rounds(
                tr, Q, G_factors, H_factors, G[:padded_n], H[:padded_n],
                l_vec, r_vec)
            ipp_proof = ipp_mod.InnerProductArgumentProof(
                L=L_v, R=R_v, a=a_fin, b=b_fin)
        else:
            ipp_proof = ipp_mod.create_ipp(tr, Q, G_factors, H_factors,
                                           G[:padded_n], H[:padded_n],
                                           l_vec, r_vec)

        return R1CSProof(A_I1=A_I1, A_O1=A_O1, S1=S1, A_I2=A_I2, A_O2=A_O2,
                         S2=S2, T_1=T_1, T_3=T_3, T_4=T_4, T_5=T_5, T_6=T_6,
                         t_x=t_x, t_x_blinding=t_x_blinding,
                         e_blinding=e_blinding, ipp_proof=ipp_proof)


class RandomizingProver(RandomizedConstraintSystem):
    """Phase-2 wrapper (`prover.rs:714-763`): same CS ops, executes deferred
    callbacks immediately, and can draw transcript challenges."""

    def __init__(self, prover):
        self.prover = prover

    def multiply(self, left, right):
        return self.prover.multiply(left, right)

    def allocate(self, assignment=None):
        return self.prover.allocate(assignment)

    def allocate_multiplier(self, input_assignments=None):
        return self.prover.allocate_multiplier(input_assignments)

    def constrain(self, lc):
        self.prover.constrain(lc)

    def specify_randomized_constraints(self, callback):
        callback(self)

    def evaluate_lc(self, lc):
        return self.prover.evaluate_lc(lc)

    def challenge_scalar(self, label):
        return self.prover.transcript.challenge_scalar(label)
