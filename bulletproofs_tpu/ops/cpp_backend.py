"""ctypes bindings for the native host runtime (native/bulletproofs_native.cpp):
64-bit-limb Montgomery field/EC kernels with a var-time Pippenger MSM.

Backend role (see backend.py): "cpp" is the fast HOST path — it replaces the
exact-but-slow Python-int backend for protocol-sized vectors that are too
small to amortize a device dispatch, and it is the natural home for
latency-sensitive verification.  The heavy-throughput path stays on TPU.

The library is built on demand with g++ (no pip deps); the ABI passes every
bignum as little-endian 64-bit limbs in plain (non-Montgomery) form.
"""

import ctypes
import os
import subprocess

import numpy as np

from ..config import CurveParams, curve
from .ec_host import G1
from .field_host import Scalar

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "bulletproofs_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libbulletproofs_native.so")

MAXL = 8
_u64p = ctypes.POINTER(ctypes.c_uint64)


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                   check=True)


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        _lib = ctypes.CDLL(_SO)
        for fn in ("bp_msm", "bp_msm2", "bp_fold", "bp_fold2",
                   "bp_scalar_mul_batch",
                   "bp_add_batch", "bp_combine_rowcol",
                   "bp_combine_totals", "bp_ipp_round_lr",
                   "bp_ipp_round_fold", "bp_msm2_multi",
                   "bp_msm2_ct", "bp_msm2_multi_ct",
                   "bp_ipp_round_lr_exp", "bp_fold4"):
            getattr(_lib, fn).restype = None
    return _lib


def _sqrt_mod(a, p):
    """Tonelli-Shanks square root mod an odd prime (None if non-residue)."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, rr = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        rr = rr * b % p
        c = b * b % p
        t = t * c % p
        m = i
    return rr


def _limbs64(v: int, L: int):
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(L)]


class _CurveABI:
    """Packed parameter block per curve (layout documented in the .cpp)."""

    _cache = {}

    def __new__(cls, cv: CurveParams):
        if cv.name in cls._cache:
            return cls._cache[cv.name]
        self = super().__new__(cls)
        cls._cache[cv.name] = self
        self.cv = cv
        self.Lp = (cv.p.bit_length() + 63) // 64
        self.Lr = (cv.r.bit_length() + 63) // 64
        r64 = 1 << (64 * self.Lp)
        params = [self.Lp, (-pow(cv.p, -1, 1 << 64)) % (1 << 64)]
        params += _limbs64(cv.p, MAXL)
        params += _limbs64((r64 * r64) % cv.p, MAXL)
        params += [self.Lr, 3 * cv.b if cv.a == 0 else 0]
        params += _limbs64(r64 % cv.p, MAXL)
        # general-a block (ed25519): Montgomery-form a, a^2, 3b
        params += [1 if cv.a != 0 else 0]
        mont = lambda v: (v % cv.p) * r64 % cv.p
        params += _limbs64(mont(cv.a), MAXL)
        params += _limbs64(mont(cv.a * cv.a), MAXL)
        params += _limbs64(mont(3 * cv.b), MAXL)
        self.params = np.array(params, dtype=np.uint64)
        # scalar-field (mod r) Montgomery context for the native IPA loop
        rr = 1 << (64 * self.Lr)
        rparams = [self.Lr, (-pow(cv.r, -1, 1 << 64)) % (1 << 64)]
        rparams += _limbs64(cv.r, MAXL)
        rparams += _limbs64((rr * rr) % cv.r, MAXL)
        self.rparams = np.array(rparams, dtype=np.uint64)
        self._pt_buf_cache = {}
        return self

    # ---- converters (int.to_bytes/from_bytes run at C speed) ----
    def points_to_buf(self, points):
        nb = self.Lp * 8
        buf = bytearray(len(points) * 3 * nb)
        i = 0
        for pt in points:
            for coord in (pt.X, pt.Y, pt.Z):
                buf[i:i + nb] = coord.to_bytes(nb, "little")
                i += nb
        return np.frombuffer(bytes(buf), dtype=np.uint64)

    def buf_to_points(self, buf, n):
        raw = np.ascontiguousarray(buf).tobytes()
        nb = self.Lp * 8
        out = []
        for i in range(n):
            base = i * 3 * nb
            X = int.from_bytes(raw[base:base + nb], "little")
            Y = int.from_bytes(raw[base + nb:base + 2 * nb], "little")
            Z = int.from_bytes(raw[base + 2 * nb:base + 3 * nb], "little")
            out.append(G1(X, Y, Z, self.cv))
        return out

    def glv_block(self):
        """GLV parameter block for bp_msm2 (all-zero when inapplicable).

        Layout (18 u64): [enabled, lam[4], mu[5], beta_plain[8]].  lam is the
        eigenvalue of the j=0 endomorphism psi(x, y) = (beta*x, y) — a root
        of x^2 + x + 1 mod r — and the native side splits every scalar as
        k = (k mod lam) + lam*(k div lam) via the Barrett reciprocal
        mu = floor(2^256/lam).  That division split only balances when
        lam ~ sqrt(r): true for bls381 (lam = z^2 - 1, 128 bits) and bn254;
        secp256k1's roots are full-width, so it (and a != 0 ed25519) keep
        GLV disabled and still get the signed-digit buckets.  beta is
        validated here against the exact host backend (psi(P) == lam*P)
        before it is ever trusted — a wrong constant cannot ship a wrong
        proof, the selftest throws first.  Accelerates the same var-time
        MSM role as /root/reference/src/ipp.rs:91,104 (amcl has neither
        endomorphism nor signed windows).
        """
        if hasattr(self, "_glv"):
            return self._glv
        blk = np.zeros(18, dtype=np.uint64)
        self._glv = blk
        cv = self.cv
        if cv.a != 0 or os.environ.get("BP_CPP_GLV", "1") == "0":
            return blk
        r, p = cv.r, cv.p
        s = _sqrt_mod(r - 3, r)
        if s is None:
            return blk
        inv2 = pow(2, -1, r)
        lam = min(((s - 1) * inv2) % r, ((-s - 1) * inv2) % r)
        if lam == 0 or lam.bit_length() > r.bit_length() // 2 + 4:
            return blk
        sp = _sqrt_mod(p - 3, p)
        if sp is None:
            return blk
        inv2p = pow(2, -1, p)
        P = G1.from_msg_hash(b"bp-glv-selftest", cv)
        zi = pow(P.Z, -1, p)
        x, y = P.X * zi % p, P.Y * zi % p
        want = P * lam
        beta = None
        for cand in (((sp - 1) * inv2p) % p, ((-sp - 1) * inv2p) % p):
            if G1(cand * x % p, y, 1, cv) == want:
                beta = cand
                break
        if beta is None:
            return blk
        blk[0] = 1
        blk[1:5] = _limbs64(lam, 4)
        blk[5:10] = _limbs64(2 ** 256 // lam, 5)
        blk[10:18] = _limbs64(beta, MAXL)
        return blk

    def scalars_to_buf(self, scalars):
        if isinstance(scalars, np.ndarray):
            # prebuilt plain-limb buffer (e.g. bp_prove_polys_eval output)
            return scalars
        nb = self.Lr * 8
        r = self.cv.r
        buf = bytearray(len(scalars) * nb)
        i = 0
        for s in scalars:
            v = (s.v if isinstance(s, Scalar) else int(s)) % r
            buf[i:i + nb] = v.to_bytes(nb, "little")
            i += nb
        return np.frombuffer(bytes(buf), dtype=np.uint64)

    def points_to_buf_cached(self, points):
        """points_to_buf with a PER-ELEMENT identity cache: the generator
        vectors (same long-lived G1 objects every proof) dominate every
        mega-MSM/commitment list, while the few proof-supplied points miss
        and convert fresh.

        SOUNDNESS: keys are element `id()`s and every entry pins a strong
        reference to its G1 (so a dead id can never be reused while the
        entry lives) — an id match implies the very same immutable object,
        a property adversarial content cannot forge (unlike sampled
        content keys, ADVICE r2)."""
        cache = self._pt_buf_cache
        if len(cache) > 1 << 16:
            cache.clear()
        nb = self.Lp * 8
        get = cache.get
        pieces = []
        for pt in points:
            hit = get(id(pt))
            if hit is None or hit[0] is not pt:
                piece = (pt.X.to_bytes(nb, "little")
                         + pt.Y.to_bytes(nb, "little")
                         + pt.Z.to_bytes(nb, "little"))
                cache[id(pt)] = hit = (pt, piece)
            pieces.append(hit[1])
        return np.frombuffer(b"".join(pieces), dtype=np.uint64)

    def buf_to_ints(self, buf, n):
        raw = np.ascontiguousarray(buf).tobytes()
        nb = self.Lr * 8
        return [int.from_bytes(raw[i * nb:(i + 1) * nb], "little")
                for i in range(n)]


def _ptr(arr):
    return arr.ctypes.data_as(_u64p)


def prove_polys_t(aL, aR, aO, sL, sR, wL, wR, wO, y, y_inv, cv):
    """Native t-poly pass (`bp_prove_polys_t`): returns (t1..t6 as plain
    ints, scratch buffer holding the per-element l1/r0/r1/r3 coefficients
    for the later x-evaluation pass)."""
    abi = _CurveABI(cv)
    lib = get_lib()
    n = len(aL)
    Lr = abi.Lr
    bufs = [abi.scalars_to_buf(v)
            for v in (aL, aR, aO, sL, sR, wL, wR, wO)]
    ybuf = abi.scalars_to_buf([y])
    yibuf = abi.scalars_to_buf([y_inv])
    t_out = np.zeros(6 * Lr, dtype=np.uint64)
    scratch = np.zeros((n * 4 + 1) * Lr, dtype=np.uint64)
    lib.bp_prove_polys_t(
        _ptr(abi.rparams), *[_ptr(b) for b in bufs], _ptr(ybuf),
        _ptr(yibuf), ctypes.c_uint64(n), _ptr(t_out), _ptr(scratch))
    return abi.buf_to_ints(t_out, 6), scratch


def prove_polys_eval(scratch, aO, sL, x, y, n, padded_n, cv):
    """Native l(x)/r(x) evaluation pass (`bp_prove_polys_eval`): returns
    (l_buf, r_buf) as plain-limb numpy buffers that feed create_ipp_rounds
    without any Python-side Scalar materialization."""
    abi = _CurveABI(cv)
    lib = get_lib()
    Lr = abi.Lr
    aObuf = abi.scalars_to_buf(aO)
    sLbuf = abi.scalars_to_buf(sL)
    xbuf = abi.scalars_to_buf([x])
    ybuf = abi.scalars_to_buf([y])
    l_out = np.zeros(padded_n * Lr, dtype=np.uint64)
    r_out = np.zeros(padded_n * Lr, dtype=np.uint64)
    lib.bp_prove_polys_eval(
        _ptr(abi.rparams), _ptr(scratch), _ptr(aObuf), _ptr(sLbuf),
        _ptr(xbuf), _ptr(ybuf), ctypes.c_uint64(n),
        ctypes.c_uint64(padded_n), _ptr(l_out), _ptr(r_out))
    return l_out, r_out


def create_ipp_rounds(transcript, Q, G_factors, H_factors, G_vec, H_vec,
                      a_vec, b_vec):
    """Native-resident IPA round loop (`/root/reference/src/ipp.rs:66-194`).

    The round state — G/H bases as ABI point buffers, a/b as plain LE
    scalar limbs — lives in numpy buffers across all log2(n) rounds; only
    the two L/R points cross to Python per round for the Fiat-Shamir
    transcript.  Rounds run in PAIRS with deferred base folds: round A
    uses the materialized bases (bp_ipp_round_lr), round B expands the
    previous challenge's fold into its MSM scalars over the UNFOLDED
    buffers (bp_ipp_round_lr_exp), and one 4-term fold (bp_fold4) per pair
    materializes the next bases — skipping every other n/2-output fold
    ladder, the dominant per-round cost.  L/R and the transcript schedule
    are identical to the generic loop (fold algebra expanded exactly), so
    proofs are byte-identical.  Returns (L_vec, R_vec, a_fin, b_fin)."""
    n = len(G_vec)
    cv = G_vec[0].cv
    abi = _CurveABI(cv)
    lib = get_lib()
    r = cv.r
    Lr = abi.Lr
    Lp3 = 3 * abi.Lp
    Gbuf = abi.points_to_buf_cached(G_vec).copy()
    Hbuf = abi.points_to_buf_cached(H_vec).copy()
    abuf = abi.scalars_to_buf(a_vec).copy()
    bbuf = abi.scalars_to_buf(b_vec).copy()
    Qbuf = abi.points_to_buf([Q])
    glv = abi.glv_block()
    outLR = np.zeros(2 * Lp3, dtype=np.uint64)
    ubuf = np.zeros(Lr, dtype=np.uint64)
    uibuf = np.zeros(Lr, dtype=np.uint64)
    # per-element basis factors as ints; None once absorbed by a fold
    gf = [int(f.v if isinstance(f, Scalar) else f) % r for f in G_factors]
    hf = [int(f.v if isinstance(f, Scalar) else f) % r for f in H_factors]
    if all(v == 1 for v in gf) and all(v == 1 for v in hf):
        gf = hf = None
    gfac = abi.scalars_to_buf(G_factors) if gf is not None else None
    hfac = abi.scalars_to_buf(H_factors) if hf is not None else None

    def draw_u(Lpt, Rpt):
        transcript.commit_point(b"L", Lpt)
        transcript.commit_point(b"R", Rpt)
        L_vec.append(Lpt)
        R_vec.append(Rpt)
        u = transcript.challenge_scalar(b"u")
        u_inv = pow(u.v, -1, r)
        ubuf[:] = np.frombuffer(u.v.to_bytes(Lr * 8, "little"),
                                dtype=np.uint64)
        uibuf[:] = np.frombuffer(u_inv.to_bytes(Lr * 8, "little"),
                                 dtype=np.uint64)
        return u.v, u_inv

    def fold_ab(n_cur):
        # scalar-only fold of a, b (bases deferred): G == NULL skips them
        lib.bp_ipp_round_fold(_ptr(abi.params), _ptr(abi.rparams),
                              _ptr(glv), None, None, _ptr(abuf),
                              _ptr(bbuf), None, None, _ptr(ubuf),
                              _ptr(uibuf), ctypes.c_uint64(n_cur))

    transcript.innerproduct_domain_sep(n)
    L_vec, R_vec = [], []
    if os.environ.get("BP_IPP_PAIRED", "1") == "0":
        # Reference-shaped round loop (A/B + baseline knob): one L/R MSM
        # then a FULL a/b/G/H fold per round, exactly the reference's
        # schedule (`/root/reference/src/ipp.rs:66-136`) with none of the
        # paired-round/deferred-fold algebra.  Proof bytes identical; used
        # with BP_NATIVE_IFMA=0 BP_CPP_GLV=0 BP_NATIVE_POLYS=0 as bench.py's
        # reference-class denominator (the AMCL-class arithmetic running
        # the AMCL-era algorithm).
        while n != 1:
            lib.bp_ipp_round_lr(
                _ptr(abi.params), _ptr(abi.rparams), _ptr(glv), _ptr(Gbuf),
                _ptr(Hbuf), _ptr(abuf), _ptr(bbuf),
                _ptr(gfac) if gf is not None else None,
                _ptr(hfac) if hf is not None else None,
                _ptr(Qbuf), ctypes.c_uint64(n), _ptr(outLR))
            Lp, Rp = abi.buf_to_points(outLR, 2)
            draw_u(Lp, Rp)
            if n > 2:
                lib.bp_ipp_round_fold(
                    _ptr(abi.params), _ptr(abi.rparams), _ptr(glv),
                    _ptr(Gbuf), _ptr(Hbuf), _ptr(abuf), _ptr(bbuf),
                    _ptr(gfac) if gf is not None else None,
                    _ptr(hfac) if hf is not None else None,
                    _ptr(ubuf), _ptr(uibuf), ctypes.c_uint64(n))
            else:
                fold_ab(n)          # bases never needed again
            gf = hf = None
            n //= 2
        a0 = int.from_bytes(np.ascontiguousarray(abuf[:Lr]).tobytes(),
                            "little")
        b0 = int.from_bytes(np.ascontiguousarray(bbuf[:Lr]).tobytes(),
                            "little")
        return L_vec, R_vec, Scalar(a0, cv), Scalar(b0, cv)
    while n != 1:
        if n >= 4:
            # ---- round A over materialized bases ----
            lib.bp_ipp_round_lr(
                _ptr(abi.params), _ptr(abi.rparams), _ptr(glv), _ptr(Gbuf),
                _ptr(Hbuf), _ptr(abuf), _ptr(bbuf),
                _ptr(gfac) if gf is not None else None,
                _ptr(hfac) if hf is not None else None,
                _ptr(Qbuf), ctypes.c_uint64(n), _ptr(outLR))
            LA, RA = abi.buf_to_points(outLR, 2)
            uA, uA_inv = draw_u(LA, RA)
            fold_ab(n)
            uAbuf = ubuf.copy()
            uAibuf = uibuf.copy()
            nB = n // 2
            # ---- round B with implicit (unfolded) bases ----
            lib.bp_ipp_round_lr_exp(
                _ptr(abi.params), _ptr(abi.rparams), _ptr(glv), _ptr(Gbuf),
                _ptr(Hbuf), _ptr(abuf), _ptr(bbuf),
                _ptr(gfac) if gf is not None else None,
                _ptr(hfac) if hf is not None else None,
                _ptr(Qbuf), ctypes.c_uint64(nB), _ptr(uAbuf),
                _ptr(uAibuf), _ptr(outLR))
            LB, RB = abi.buf_to_points(outLR, 2)
            uB, uB_inv = draw_u(LB, RB)
            fold_ab(nB)
            nQ = nB // 2
            if nQ >= 2:
                # ---- one 4-term fold materializes the next bases ----
                # G'' combos (G-folds use (u_inv, u), ipp.rs:119-130):
                #   c1 = uBinv*uAinv*fg[i]        over G[0:nQ]
                #   c2 = uB*uAinv*fg[nQ+i]        over G[nQ:2nQ]
                #   c3 = uBinv*uA*fg[nB+i]        over G[nB:nB+nQ]
                #   c4 = uB*uA*fg[nB+nQ+i]        over G[nB+nQ:nB+2nQ]
                # H'' mirrored with u <-> u_inv swapped.
                def combos(p1, p2, p3, p4, fac):
                    if fac is None:
                        # constant per-element coefficient: convert once,
                        # tile (scalars_to_buf of an nQ-long constant list
                        # was ~25% of create_ipp_rounds' Python time)
                        return [np.tile(abi.scalars_to_buf([p]), nQ)
                                for p in (p1, p2, p3, p4)]
                    return [abi.scalars_to_buf(
                                [p1 * f % r for f in fac[:nQ]]),
                            abi.scalars_to_buf(
                                [p2 * f % r for f in fac[nQ:2 * nQ]]),
                            abi.scalars_to_buf(
                                [p3 * f % r for f in fac[nB:nB + nQ]]),
                            abi.scalars_to_buf(
                                [p4 * f % r
                                 for f in fac[nB + nQ:nB + 2 * nQ]])]

                def fold4(buf, cs):
                    out4 = np.zeros(nQ * Lp3, dtype=np.uint64)
                    lib.bp_fold4(
                        _ptr(abi.params), _ptr(buf), _ptr(buf[nQ * Lp3:]),
                        _ptr(buf[nB * Lp3:]), _ptr(buf[(nB + nQ) * Lp3:]),
                        _ptr(cs[0]), _ptr(cs[1]), _ptr(cs[2]), _ptr(cs[3]),
                        ctypes.c_uint64(nQ), _ptr(out4))
                    buf[:nQ * Lp3] = out4

                fold4(Gbuf, combos(uB_inv * uA_inv % r, uB * uA_inv % r,
                                   uB_inv * uA % r, uB * uA % r, gf))
                fold4(Hbuf, combos(uB * uA % r, uB_inv * uA % r,
                                   uB * uA_inv % r, uB_inv * uA_inv % r,
                                   hf))
                gf = hf = None
            n = nQ
        else:
            # ---- final single round (n == 2): bases never needed again
            lib.bp_ipp_round_lr(
                _ptr(abi.params), _ptr(abi.rparams), _ptr(glv), _ptr(Gbuf),
                _ptr(Hbuf), _ptr(abuf), _ptr(bbuf),
                _ptr(gfac) if gf is not None else None,
                _ptr(hfac) if hf is not None else None,
                _ptr(Qbuf), ctypes.c_uint64(n), _ptr(outLR))
            Lp, Rp = abi.buf_to_points(outLR, 2)
            draw_u(Lp, Rp)
            fold_ab(n)
            n //= 2
    a0 = int.from_bytes(np.ascontiguousarray(abuf[:Lr]).tobytes(), "little")
    b0 = int.from_bytes(np.ascontiguousarray(bbuf[:Lr]).tobytes(), "little")
    return L_vec, R_vec, Scalar(a0, cv), Scalar(b0, cv)


class CppBackend:
    name = "cpp"

    def _abi(self, points):
        return _CurveABI(points[0].cv if points else curve())

    def msm(self, points, scalars, ct=False):
        """Native MSM: projective points straight through to bp_msm2, which
        batch-normalizes, signed-digit-recodes, and (bls381/bn254) GLV-splits
        in C++ — the round-2 Python-side big-int normalization was ~45% of
        wall time at n=2^16.  BP_CPP_LEGACY_MSM=1 keeps the old path for A/B.

        ct=True routes to bp_msm2_ct, the constant-WORK core for secret
        (witness) scalars: full-width window count, no zero-digit skips, no
        GLV — the operation count is scalar-independent (the analog of the
        reference's `G1Vector::inner_product_const_time`,
        `/root/reference/src/r1cs/prover.rs:358,423`; posture in AUDIT.md).
        Same group element bit-for-bit.
        """
        if not points:
            return G1.identity()
        if os.environ.get("BP_CPP_LEGACY_MSM") == "1" and not ct:
            return self._msm_legacy(points, scalars)
        abi = self._abi(points)
        lib = get_lib()
        out = np.zeros(3 * abi.Lp, dtype=np.uint64)
        fn = lib.bp_msm2_ct if ct else lib.bp_msm2
        fn(_ptr(abi.params), _ptr(abi.glv_block()),
           _ptr(abi.points_to_buf_cached(points)),
           _ptr(abi.scalars_to_buf(scalars)),
           ctypes.c_uint64(len(points)), _ptr(out))
        return abi.buf_to_points(out, 1)[0]

    def msm_multi(self, points, scalar_sets, ct=False):
        """k MSMs over ONE point table in one native call: the (costly)
        batch normalization + GLV psi prep is shared across the k scalar
        sets.  Used by the prover's phase-1/phase-2 witness commitments
        (A_I, A_O, S over the same [G | H | h] table, `prover.rs:336-434`).
        Returns k G1 results.  ct=True: constant-work core (see `msm`)."""
        k = len(scalar_sets)
        if not points:
            return [G1.identity() for _ in range(k)]
        abi = self._abi(points)
        lib = get_lib()
        n = len(points)
        sbuf = np.concatenate(
            [abi.scalars_to_buf(s) for s in scalar_sets])
        out = np.zeros(k * 3 * abi.Lp, dtype=np.uint64)
        fn = lib.bp_msm2_multi_ct if ct else lib.bp_msm2_multi
        fn(_ptr(abi.params), _ptr(abi.glv_block()),
           _ptr(abi.points_to_buf_cached(points)), _ptr(sbuf),
           ctypes.c_uint64(n), ctypes.c_uint64(k),
           _ptr(out))
        return abi.buf_to_points(out, k)

    def _msm_legacy(self, points, scalars):
        abi = self._abi(points)
        lib = get_lib()
        p = abi.cv.p
        # batch-normalize to affine (one inversion via the Montgomery
        # trick): the native bucket loop then uses MIXED adds (Z2 = 1).
        # Identity points cannot be encoded affinely — zero their scalars
        # instead (digit-0 entries are never scheduled).
        safe = [pt.Z if pt.Z != 0 else 1 for pt in points]
        prefix = [1] * (len(safe) + 1)
        for i, z in enumerate(safe):
            prefix[i + 1] = prefix[i] * z % p
        inv_all = pow(prefix[-1], -1, p)
        invs = [0] * len(safe)
        for i in range(len(safe) - 1, -1, -1):
            invs[i] = prefix[i] * inv_all % p
            inv_all = inv_all * safe[i] % p

        nb = abi.Lp * 8
        buf = bytearray(len(points) * 2 * nb)
        ks = list(scalars)
        off = 0
        for i, (pt, zinv) in enumerate(zip(points, invs)):
            if pt.Z == 0:
                ks[i] = Scalar.zero()
                off += 2 * nb
                continue
            buf[off:off + nb] = (pt.X * zinv % p).to_bytes(nb, "little")
            off += nb
            buf[off:off + nb] = (pt.Y * zinv % p).to_bytes(nb, "little")
            off += nb
        pts_buf = np.frombuffer(bytes(buf), dtype=np.uint64)

        out = np.zeros(3 * abi.Lp, dtype=np.uint64)
        lib.bp_msm(_ptr(abi.params), _ptr(pts_buf),
                   _ptr(abi.scalars_to_buf(ks)),
                   ctypes.c_uint64(len(points)), _ptr(out))
        return abi.buf_to_points(out, 1)[0]

    def fold_points(self, P_L, P_R, s1, s2):
        n = len(P_L)
        abi = self._abi(P_L)
        lib = get_lib()
        s1 = list(s1) if isinstance(s1, (list, tuple)) else [s1] * n
        s2 = list(s2) if isinstance(s2, (list, tuple)) else [s2] * n
        # pad small batches to a full 8-lane IFMA group: the vertical
        # engine's ladder costs ~the same for 8 lanes as the 1-way
        # remainder path costs for ONE (zero-scalar pad lanes are free —
        # they never extend the shared ladder length)
        n_call = n
        if 0 < n < 8:
            pad = 8 - n
            P_L = list(P_L) + [P_L[0]] * pad
            P_R = list(P_R) + [P_R[0]] * pad
            s1 = s1 + [0] * pad
            s2 = s2 + [0] * pad
            n_call = 8
        out = np.zeros(n_call * 3 * abi.Lp, dtype=np.uint64)
        lib.bp_fold2(_ptr(abi.params), _ptr(abi.glv_block()),
                     _ptr(abi.points_to_buf(P_L)),
                     _ptr(abi.points_to_buf(P_R)),
                     _ptr(abi.scalars_to_buf(s1)),
                     _ptr(abi.scalars_to_buf(s2)),
                     ctypes.c_uint64(n_call), _ptr(out))
        return abi.buf_to_points(out, n)

    def scalar_mul_batch(self, points, scalars):
        n = len(points)
        abi = self._abi(points)
        lib = get_lib()
        out = np.zeros(n * 3 * abi.Lp, dtype=np.uint64)
        lib.bp_scalar_mul_batch(_ptr(abi.params),
                                _ptr(abi.points_to_buf(points)),
                                _ptr(abi.scalars_to_buf(scalars)),
                                ctypes.c_uint64(n), _ptr(out))
        return abi.buf_to_points(out, n)
