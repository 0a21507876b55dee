// Native host runtime: 64-bit-limb Montgomery field + G1 arithmetic.
//
// This is the TPU framework's replacement for the reference's native math
// layer (the AMCL bignum/EC stack consumed through `amcl_wrapper`,
// SURVEY.md section 2.1).  The TPU device path lives in JAX/Pallas kernels
// (bulletproofs_tpu/ops/*_jax.py); this library serves the HOST side:
// circuit-construction-adjacent scalar math, fast verification on CPU, and
// the ground-truth backend for tests at speed.
//
// Design: generic over the curve — all constants (modulus limbs, Montgomery
// R^2, -p^-1 mod 2^64, curve b) arrive at the ABI as plain uint64 arrays so
// the same .so serves BLS12-381 and BN254.  Points use the same branch-free
// complete projective addition (Renes-Costello-Batina 2016, a=0) as the
// Python host and JAX device backends, so all three agree bit-for-bit.
//
// ABI: every in/out bignum is little-endian 64-bit limbs, PLAIN (non-
// Montgomery) representation; conversion happens inside.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const int MAXL = 8;

struct Field {
    int L;
    u64 mod[MAXL];
    u64 r2[MAXL];       // R^2 mod p (Montgomery enter)
    u64 n0inv;          // -p^-1 mod 2^64

    // CIOS Montgomery multiply: out = a*b*R^-1 mod p (canonical)
    void mont_mul(const u64* a, const u64* b, u64* out) const {
        u64 t[MAXL + 2] = {0};
        for (int i = 0; i < L; i++) {
            // t += a[i] * b
            u128 carry = 0;
            for (int j = 0; j < L; j++) {
                u128 s = (u128)a[i] * b[j] + t[j] + carry;
                t[j] = (u64)s;
                carry = s >> 64;
            }
            u128 s = (u128)t[L] + carry;
            t[L] = (u64)s;
            t[L + 1] = (u64)(s >> 64);
            // m = t[0] * n0inv mod 2^64; t = (t + m*p) / 2^64
            u64 m = t[0] * n0inv;
            carry = ((u128)m * mod[0] + t[0]) >> 64;
            for (int j = 1; j < L; j++) {
                u128 s2 = (u128)m * mod[j] + t[j] + carry;
                t[j - 1] = (u64)s2;
                carry = s2 >> 64;
            }
            u128 s3 = (u128)t[L] + carry;
            t[L - 1] = (u64)s3;
            t[L] = t[L + 1] + (u64)(s3 >> 64);
            t[L + 1] = 0;
        }
        // conditional subtract (t < 2p)
        cond_sub(t, out);
    }

    void cond_sub(const u64* t, u64* out) const {
        u64 d[MAXL];
        u128 borrow = 0;
        for (int j = 0; j < L; j++) {
            u128 s = (u128)t[j] - mod[j] - borrow;
            d[j] = (u64)s;
            borrow = (s >> 64) & 1;
        }
        // include t[L] (possible carry limb)
        u128 s = (u128)t[L] - borrow;
        bool ge = !((s >> 64) & 1);
        for (int j = 0; j < L; j++) out[j] = ge ? d[j] : t[j];
    }

    void add(const u64* a, const u64* b, u64* out) const {
        u64 t[MAXL + 2] = {0};
        u128 carry = 0;
        for (int j = 0; j < L; j++) {
            u128 s = (u128)a[j] + b[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        t[L] = (u64)carry;
        cond_sub(t, out);
    }

    void sub(const u64* a, const u64* b, u64* out) const {
        u128 borrow = 0;
        u64 d[MAXL];
        for (int j = 0; j < L; j++) {
            u128 s = (u128)a[j] - b[j] - borrow;
            d[j] = (u64)s;
            borrow = (s >> 64) & 1;
        }
        if (borrow) {
            u128 carry = 0;
            for (int j = 0; j < L; j++) {
                u128 s = (u128)d[j] + mod[j] + carry;
                out[j] = (u64)s;
                carry = s >> 64;
            }
        } else {
            for (int j = 0; j < L; j++) out[j] = d[j];
        }
    }

    void mul_small(const u64* a, u64 k, u64* out) const {
        // double-and-add over k's bits (k is a tiny curve constant)
        u64 acc[MAXL];
        int top = 63;
        while (top > 0 && !((k >> top) & 1)) top--;
        for (int j = 0; j < L; j++) acc[j] = a[j];
        for (int b = top - 1; b >= 0; b--) {
            add(acc, acc, acc);
            if ((k >> b) & 1) add(acc, a, acc);
        }
        for (int j = 0; j < L; j++) out[j] = acc[j];
    }

    void to_mont(const u64* a, u64* out) const { mont_mul(a, r2, out); }
    void from_mont(const u64* a, u64* out) const {
        u64 one[MAXL] = {1};
        mont_mul(a, one, out);
    }
    bool is_zero(const u64* a) const {
        for (int j = 0; j < L; j++) if (a[j]) return false;
        return true;
    }
};

struct Curve {
    Field fp;
    int Lr;                 // scalar limb count (plain form scalars)
    u64 b3;                 // 3*b as a small integer (a = 0 curves)
    u64 one_m[MAXL];        // Montgomery 1 in fp
    bool a_nonzero;         // general Weierstrass a != 0 (ed25519)
    u64 a_m[MAXL];          // a   in Montgomery form
    u64 a2_m[MAXL];         // a^2 in Montgomery form
    u64 b3_m[MAXL];         // 3b  in Montgomery form
};

struct Pt { u64 X[MAXL], Y[MAXL], Z[MAXL]; };

static void pt_identity(const Curve& c, Pt& p) {
    memset(&p, 0, sizeof(Pt));
    for (int j = 0; j < c.fp.L; j++) p.Y[j] = c.one_m[j];
}

// Complete projective add, RCB16 (same formulas as ops/ec_host.py):
// the a=0 specialization (algorithm 7) for the pairing curves/secp256k1,
// the general-a algorithm 1 for ed25519's Weierstrass form.
static void pt_add(const Curve& c, const Pt& P, const Pt& Q, Pt& R) {
    const Field& f = c.fp;
    u64 t0[MAXL], t1[MAXL], t2[MAXL], xy[MAXL], yz[MAXL], xz[MAXL];
    u64 sa[MAXL], sb[MAXL], m[MAXL], n[MAXL], tmp[MAXL], tmp2[MAXL];

    f.mont_mul(P.X, Q.X, t0);
    f.mont_mul(P.Y, Q.Y, t1);
    f.mont_mul(P.Z, Q.Z, t2);

    f.add(P.X, P.Y, sa); f.add(Q.X, Q.Y, sb);
    f.mont_mul(sa, sb, xy); f.sub(xy, t0, xy); f.sub(xy, t1, xy);
    f.add(P.Y, P.Z, sa); f.add(Q.Y, Q.Z, sb);
    f.mont_mul(sa, sb, yz); f.sub(yz, t1, yz); f.sub(yz, t2, yz);
    f.add(P.X, P.Z, sa); f.add(Q.X, Q.Z, sb);
    f.mont_mul(sa, sb, xz); f.sub(xz, t0, xz); f.sub(xz, t2, xz);

    if (c.a_nonzero) {
        // w = a*xz + b3*t2; m = t1 - w; n = t1 + w
        u64 w[MAXL], u1[MAXL], u4[MAXL];
        f.mont_mul(c.a_m, xz, w);
        f.mont_mul(c.b3_m, t2, tmp); f.add(w, tmp, w);
        f.sub(t1, w, m);
        f.add(t1, w, n);
        // u1 = 3*t0 + a*t2
        f.mul_small(t0, 3, u1);
        f.mont_mul(c.a_m, t2, tmp); f.add(u1, tmp, u1);
        // u4 = b3*xz + a*t0 - a^2*t2
        f.mont_mul(c.b3_m, xz, u4);
        f.mont_mul(c.a_m, t0, tmp); f.add(u4, tmp, u4);
        f.mont_mul(c.a2_m, t2, tmp); f.sub(u4, tmp, u4);
        // X3 = xy*m - yz*u4; Y3 = m*n + u1*u4; Z3 = yz*n + xy*u1
        f.mont_mul(yz, u4, tmp); f.mont_mul(xy, m, tmp2);
        f.sub(tmp2, tmp, R.X);
        f.mont_mul(m, n, tmp); f.mont_mul(u1, u4, tmp2);
        f.add(tmp, tmp2, R.Y);
        f.mont_mul(yz, n, tmp); f.mont_mul(xy, u1, tmp2);
        f.add(tmp, tmp2, R.Z);
        return;
    }

    u64 b3t2[MAXL];
    f.mul_small(t2, c.b3, b3t2);
    f.sub(t1, b3t2, m);
    f.add(t1, b3t2, n);

    // X3 = xy*m - b3*(yz*xz)
    f.mont_mul(yz, xz, tmp); f.mul_small(tmp, c.b3, tmp);
    f.mont_mul(xy, m, tmp2); f.sub(tmp2, tmp, R.X);
    // Y3 = n*m + 3*b3*(t0*xz)
    f.mont_mul(t0, xz, tmp); f.mul_small(tmp, 3 * c.b3, tmp);
    f.mont_mul(n, m, tmp2); f.add(tmp2, tmp, R.Y);
    // Z3 = yz*n + 3*(t0*xy)
    f.mont_mul(t0, xy, tmp); f.mul_small(tmp, 3, tmp);
    f.mont_mul(yz, n, tmp2); f.add(tmp2, tmp, R.Z);
}

struct PtAff { u64 X[MAXL], Y[MAXL]; };

// Mixed complete add (Z2 = 1, a = 0 curves): saves the Z1*Z2 product and
// turns yz/xz into single multiplies (11 Montgomery muls vs 12 + cheaper
// add chains).  Still complete in P (identity P handled; affine Q cannot
// encode the identity — the MSM driver zeroes identity points' scalars so
// they are never scheduled).
static void pt_add_mixed(const Curve& c, const Pt& P, const PtAff& Q,
                         Pt& R) {
    const Field& f = c.fp;
    u64 t0[MAXL], t1[MAXL], xy[MAXL], yz[MAXL], xz[MAXL];
    u64 sa[MAXL], sb[MAXL], m[MAXL], n[MAXL], tmp[MAXL], tmp2[MAXL];

    f.mont_mul(P.X, Q.X, t0);
    f.mont_mul(P.Y, Q.Y, t1);
    f.add(P.X, P.Y, sa); f.add(Q.X, Q.Y, sb);
    f.mont_mul(sa, sb, xy); f.sub(xy, t0, xy); f.sub(xy, t1, xy);
    f.mont_mul(Q.Y, P.Z, tmp); f.add(P.Y, tmp, yz);   // Y1 + Y2*Z1
    f.mont_mul(Q.X, P.Z, tmp); f.add(P.X, tmp, xz);   // X1 + X2*Z1

    u64 b3t2[MAXL];
    f.mul_small(P.Z, c.b3, b3t2);                     // t2 == Z1
    f.sub(t1, b3t2, m);
    f.add(t1, b3t2, n);

    f.mont_mul(yz, xz, tmp); f.mul_small(tmp, c.b3, tmp);
    f.mont_mul(xy, m, tmp2); f.sub(tmp2, tmp, R.X);
    f.mont_mul(t0, xz, tmp); f.mul_small(tmp, 3 * c.b3, tmp);
    f.mont_mul(n, m, tmp2); f.add(tmp2, tmp, R.Y);
    f.mont_mul(t0, xy, tmp); f.mul_small(tmp, 3, tmp);
    f.mont_mul(yz, n, tmp2); f.add(tmp2, tmp, R.Z);
}

static inline int scalar_bit(const u64* k, int Lr, int bit) {
    return (k[bit >> 6] >> (bit & 63)) & 1;
}

static int scalar_bits(const u64* k, int Lr) {
    for (int j = Lr - 1; j >= 0; j--) {
        if (k[j]) {
            int b = 63;
            while (!((k[j] >> b) & 1)) b--;
            return j * 64 + b + 1;
        }
    }
    return 0;
}

static void pt_scalar_mul(const Curve& c, const Pt& P, const u64* k, Pt& R) {
    pt_identity(c, R);
    int bits = scalar_bits(k, c.Lr);
    for (int b = bits - 1; b >= 0; b--) {
        pt_add(c, R, R, R);
        if (scalar_bit(k, c.Lr, b)) pt_add(c, R, P, R);
    }
}

// ---------------------------------------------------------------------------
// ABI helpers: params layout (all u64):
// [Lp, n0inv, mod[8], r2[8], Lr, b3, one_m[8],
//  a_nonzero, a_m[8], a2_m[8], b3_m[8]]  => 53 words
// (a_m/a2_m/b3_m are MONTGOMERY-form constants, used iff a_nonzero)
// points: n * 3 * Lp plain-form limbs (X, Y, Z projective)
// ---------------------------------------------------------------------------

static Curve load_curve(const u64* p) {
    Curve c;
    memset(&c, 0, sizeof(c));
    c.fp.L = (int)p[0];
    c.fp.n0inv = p[1];
    memcpy(c.fp.mod, p + 2, 8 * sizeof(u64));
    memcpy(c.fp.r2, p + 10, 8 * sizeof(u64));
    c.Lr = (int)p[18];
    c.b3 = p[19];
    memcpy(c.one_m, p + 20, 8 * sizeof(u64));
    c.a_nonzero = p[28] != 0;
    memcpy(c.a_m, p + 29, 8 * sizeof(u64));
    memcpy(c.a2_m, p + 37, 8 * sizeof(u64));
    memcpy(c.b3_m, p + 45, 8 * sizeof(u64));
    return c;
}

static void load_pt(const Curve& c, const u64* src, Pt& p) {
    memset(&p, 0, sizeof(Pt));
    int L = c.fp.L;
    c.fp.to_mont(src, p.X);
    c.fp.to_mont(src + L, p.Y);
    c.fp.to_mont(src + 2 * L, p.Z);
}

static void store_pt(const Curve& c, const Pt& p, u64* dst) {
    int L = c.fp.L;
    c.fp.from_mont(p.X, dst);
    c.fp.from_mont(p.Y, dst + L);
    c.fp.from_mont(p.Z, dst + 2 * L);
}

extern "C" {

// out = sum_i scalars[i] * points[i]  (Pippenger, var-time)
// `points` are AFFINE (x, y) pairs (the Python driver batch-normalizes and
// zeroes the scalars of identity points); bucket accumulation uses mixed
// adds on a=0 curves.
void bp_msm(const u64* params, const u64* points, const u64* scalars,
            u64 n, u64* out) {
    Curve c = load_curve(params);
    int L = c.fp.L, Lr = c.Lr;

    std::vector<PtAff> pts(n);
    for (u64 i = 0; i < n; i++) {
        c.fp.to_mont(points + i * 2 * L, pts[i].X);
        c.fp.to_mont(points + i * 2 * L + L, pts[i].Y);
    }

    int maxbits = 0;
    for (u64 i = 0; i < n; i++) {
        int b = scalar_bits(scalars + i * Lr, Lr);
        if (b > maxbits) maxbits = b;
    }
    Pt total; pt_identity(c, total);
    if (maxbits == 0) { store_pt(c, total, out); return; }

    // window size from the cost model: per window, ~n mixed adds of
    // accumulation (weight 0.85 vs full adds) + 2*2^c full adds of dense
    // combine; minimize over c (a log2(n)-sized c makes the combine as
    // expensive as accumulation)
    // empirically-swept window sizes (n=4183 on this host: c=9 353 ms,
    // c=8 381, c=10 362, c=11 404, c=12 530)
    int cbits;
    if (n < 128) cbits = 4;
    else if (n < 512) cbits = 6;
    else if (n < 2048) cbits = 8;
    else if (n < 16384) cbits = 9;
    else if (n < 65536) cbits = 10;
    else cbits = 11;
    const char* ov = getenv("BP_CPP_WINDOW");
    if (ov && ov[0]) {
        int v = atoi(ov);
        if (v >= 1 && v <= 16) cbits = v;
    }

    int nwin = (maxbits + cbits - 1) / cbits;
    u64 nbuckets = (u64)1 << cbits;
    std::vector<Pt> buckets(nbuckets);
    std::vector<bool> used(nbuckets);

    Pt full_q;                        // staging for the a != 0 fallback
    for (int j = 0; j < L; j++) full_q.Z[j] = c.one_m[j];

    for (int w = nwin - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) pt_add(c, total, total, total);
        std::fill(used.begin(), used.end(), false);
        for (u64 i = 0; i < n; i++) {
            const u64* k = scalars + i * Lr;
            u64 dig = 0;
            for (int b = cbits - 1; b >= 0; b--) {
                int bit = w * cbits + b;
                dig = (dig << 1) |
                      (bit < maxbits ? scalar_bit(k, Lr, bit) : 0);
            }
            if (!dig) continue;
            if (used[dig]) {
                if (!c.a_nonzero) {
                    pt_add_mixed(c, buckets[dig], pts[i], buckets[dig]);
                } else {
                    memcpy(full_q.X, pts[i].X, sizeof(full_q.X));
                    memcpy(full_q.Y, pts[i].Y, sizeof(full_q.Y));
                    pt_add(c, buckets[dig], full_q, buckets[dig]);
                }
            } else {
                memset(&buckets[dig], 0, sizeof(Pt));
                memcpy(buckets[dig].X, pts[i].X, sizeof(full_q.X));
                memcpy(buckets[dig].Y, pts[i].Y, sizeof(full_q.Y));
                for (int j = 0; j < L; j++) buckets[dig].Z[j] = c.one_m[j];
                used[dig] = true;
            }
        }
        Pt running, subtotal;
        pt_identity(c, running);
        pt_identity(c, subtotal);
        for (u64 d = nbuckets - 1; d >= 1; d--) {
            if (used[d]) pt_add(c, running, buckets[d], running);
            pt_add(c, subtotal, running, subtotal);
        }
        pt_add(c, total, subtotal, total);
    }
    store_pt(c, total, out);
}

// out[i] = s1[i]*PL[i] + s2[i]*PR[i]  (Straus shared-doubling ladder)
void bp_fold(const u64* params, const u64* PL, const u64* PR,
             const u64* s1, const u64* s2, u64 n, u64* out) {
    Curve c = load_curve(params);
    int L = c.fp.L, Lr = c.Lr;
    for (u64 i = 0; i < n; i++) {
        Pt a, b, tab3, acc;
        load_pt(c, PL + i * 3 * L, a);
        load_pt(c, PR + i * 3 * L, b);
        pt_add(c, a, b, tab3);
        pt_identity(c, acc);
        const u64* k1 = s1 + i * Lr;
        const u64* k2 = s2 + i * Lr;
        int bits = scalar_bits(k1, Lr);
        int b2 = scalar_bits(k2, Lr);
        if (b2 > bits) bits = b2;
        for (int bi = bits - 1; bi >= 0; bi--) {
            pt_add(c, acc, acc, acc);
            int sel = scalar_bit(k1, Lr, bi) | (scalar_bit(k2, Lr, bi) << 1);
            if (sel == 1) pt_add(c, acc, a, acc);
            else if (sel == 2) pt_add(c, acc, b, acc);
            else if (sel == 3) pt_add(c, acc, tab3, acc);
        }
        store_pt(c, acc, out + i * 3 * L);
    }
}

// out[i] = k[i] * P[i]
void bp_scalar_mul_batch(const u64* params, const u64* P, const u64* k,
                         u64 n, u64* out) {
    Curve c = load_curve(params);
    int L = c.fp.L;
    for (u64 i = 0; i < n; i++) {
        Pt p, r;
        load_pt(c, P + i * 3 * L, p);
        pt_scalar_mul(c, p, k + i * c.Lr, r);
        store_pt(c, r, out + i * 3 * L);
    }
}

// Hybrid MSM combine: finish the bucket combine of the device Pippenger on
// the host.  The device computes, per window w of each scalar set, the
// two-level bucket sums rowsum[w,g] = sum_k B[w, g*K+k] and colsum[w,k] =
// sum_g B[w, g*K+k] (the WIDE part); this routine does the SERIAL tail —
// T_w = K*(sum_g g*rowsum) + sum_k k*colsum, then the Horner window combine
// acc = 2^c*acc + T_w — which on the TPU is a ~300-step latency-bound chain
// of single-point adds.  nwin = nsets * wins_per_set windows total.
void bp_combine_rowcol(const u64* params, const u64* rowsum,
                       const u64* colsum, u64 nwin, u64 gsize, u64 ksize,
                       u64 cbits, u64 wins_per_set, u64* out) {
    Curve c = load_curve(params);
    int L = c.fp.L;
    std::vector<Pt> totals(nwin);
    for (u64 w = 0; w < nwin; w++) {
        // wr = sum_g g * rowsum[w,g]  (descending running sums)
        Pt running, wr, wc, tmp;
        pt_identity(c, running);
        pt_identity(c, wr);
        for (u64 g = gsize - 1; g >= 1; g--) {
            load_pt(c, rowsum + (w * gsize + g) * 3 * L, tmp);
            pt_add(c, running, tmp, running);
            pt_add(c, wr, running, wr);
        }
        pt_identity(c, running);
        pt_identity(c, wc);
        for (u64 k = ksize - 1; k >= 1; k--) {
            load_pt(c, colsum + (w * ksize + k) * 3 * L, tmp);
            pt_add(c, running, tmp, running);
            pt_add(c, wc, running, wc);
        }
        // totals = K * wr + wc
        u64 kk = ksize;
        while (kk > 1) { pt_add(c, wr, wr, wr); kk >>= 1; }
        pt_add(c, wr, wc, totals[w]);
    }
    u64 nsets = nwin / wins_per_set;
    for (u64 s = 0; s < nsets; s++) {
        Pt acc;
        pt_identity(c, acc);
        for (u64 wi = wins_per_set; wi-- > 0;) {
            for (u64 d = 0; d < cbits; d++) pt_add(c, acc, acc, acc);
            pt_add(c, acc, totals[s * wins_per_set + wi], acc);
        }
        store_pt(c, acc, out + s * 3 * L);
    }
}

// out[i] = P[i] + Q[i]  (cross-check primitive)
void bp_add_batch(const u64* params, const u64* P, const u64* Q,
                  u64 n, u64* out) {
    Curve c = load_curve(params);
    int L = c.fp.L;
    for (u64 i = 0; i < n; i++) {
        Pt p, q, r;
        load_pt(c, P + i * 3 * L, p);
        load_pt(c, Q + i * 3 * L, q);
        pt_add(c, p, q, r);
        store_pt(c, r, out + i * 3 * L);
    }
}

}  // extern "C"
