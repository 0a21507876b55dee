// Native host runtime: Montgomery field + G1 arithmetic, two field engines.
//
// This is the TPU framework's replacement for the reference's native math
// layer (the AMCL bignum/EC stack consumed through `amcl_wrapper`,
// SURVEY.md section 2.1).  The TPU device path lives in JAX kernels
// (bulletproofs_tpu/ops/*_jax.py); this library serves the HOST side:
// circuit-construction-adjacent scalar math, fast verification on CPU, and
// the ground-truth backend for tests at speed.
//
// Field engines (selected at runtime per call):
//  - Field   : portable 64-bit-limb CIOS (u128 products) — runs anywhere.
//  - Field52 : 52-bit-limb Montgomery multiply on AVX512-IFMA
//    (vpmadd52l/huq, one zmm holds all limbs; deferred-carry accumulation)
//    — used when the CPU supports it (runtime __builtin_cpu_supports
//    check; BP_NATIVE_IFMA=0 disables).  Same math, identical canonical
//    outputs: the ABI is plain 64-bit limbs either way, so host/cpp/jax
//    backends stay bit-exact (tests/test_cross_backend.py).
//
// Points use the same branch-free complete projective addition
// (Renes-Costello-Batina 2016) as the Python host and JAX device backends,
// templated over the field engine.
//
// ABI: every in/out bignum is little-endian 64-bit limbs, PLAIN (non-
// Montgomery) representation; conversion happens inside.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

typedef unsigned __int128 u128;
typedef uint64_t u64;

static const int MAXL = 8;

// ---------------------------------------------------------------------------
// Engine 1: portable 64-bit-limb CIOS
// ---------------------------------------------------------------------------

struct Field {
    int L;              // 64-bit limbs
    int L64;            // ABI limb count (== L)
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

    bool is_zero(const u64* a) const {
        for (int j = 0; j < L; j++) if (a[j]) return false;
        return true;
    }

    // ABI (plain little-endian 64-bit limbs) <-> internal Montgomery form
    void abi_to_mont(const u64* src, u64* out) const {
        u64 tmp[MAXL] = {0};
        for (int j = 0; j < L; j++) tmp[j] = src[j];
        mont_mul(tmp, r2, out);
    }
    void mont_to_abi(const u64* a, u64* dst) const {
        u64 one[MAXL] = {1};
        u64 tmp[MAXL] = {0};
        mont_mul(a, one, tmp);
        for (int j = 0; j < L; j++) dst[j] = tmp[j];
    }
};

// ---------------------------------------------------------------------------
// Engine 2: 52-bit-limb Montgomery multiply on AVX512-IFMA
// ---------------------------------------------------------------------------

static const u64 M52 = ((u64)1 << 52) - 1;

struct Field52 {
    int L;                      // number of 52-bit limbs (<= 8)
    int L64;                    // ABI 64-bit limb count
    alignas(64) u64 mod[MAXL];  // p, 52-bit limbs, zero-padded to 8
    u64 r2[MAXL];               // (2^(52L))^2 mod p, 52-limb form
    u64 n0inv;                  // -p^-1 mod 2^52

#if defined(__x86_64__)
    __attribute__((target("avx512f,avx512ifma,avx512vl,avx512dq")))
    void mont_mul(const u64* a, const u64* b, u64* out) const {
        // Word-by-word Montgomery, base 2^52, deferred carries: the
        // accumulator T keeps one 64-bit lane per 52-bit limb; lo/hi
        // halves of every vpmadd52 product land in lanes j / j+1, and
        // per-lane sums stay < 2^58 over L iterations, so carries are
        // resolved ONCE at the end.
        const __m512i B = _mm512_loadu_si512((const void*)b);
        const __m512i P = _mm512_load_si512((const void*)mod);
        const __m512i Zv = _mm512_setzero_si512();
        __m512i T = Zv;
        for (int i = 0; i < L; i++) {
            const __m512i ai = _mm512_set1_epi64((long long)a[i]);
            T = _mm512_madd52lo_epu64(T, ai, B);
            __m512i Hi = _mm512_madd52hi_epu64(Zv, ai, B);
            u64 t0 = (u64)_mm_cvtsi128_si64(_mm512_castsi512_si128(T));
            u64 m = ((t0 & M52) * n0inv) & M52;
            const __m512i mv = _mm512_set1_epi64((long long)m);
            T = _mm512_madd52lo_epu64(T, mv, P);
            Hi = _mm512_madd52hi_epu64(Hi, mv, P);
            t0 = (u64)_mm_cvtsi128_si64(_mm512_castsi512_si128(T));
            const u64 carry0 = t0 >> 52;      // low 52 bits are 0 by m
            // shift one limb down, absorb hi products and the carry
            T = _mm512_alignr_epi64(Zv, T, 1);
            T = _mm512_add_epi64(T, Hi);
            T = _mm512_add_epi64(
                T, _mm512_maskz_set1_epi64(0x01, (long long)carry0));
        }
        alignas(64) u64 t[MAXL + 1];
        _mm512_store_si512((void*)t, T);
        // resolve deferred carries to canonical 52-bit limbs
        u64 c = 0;
        for (int j = 0; j < L; j++) {
            u64 s = t[j] + c;
            t[j] = s & M52;
            c = s >> 52;
        }
        t[L] = c;
        cond_sub(t, out);
    }
#else
    void mont_mul(const u64* a, const u64* b, u64* out) const {
        (void)a; (void)b; (void)out;  // never dispatched off x86-64
    }
#endif

    void cond_sub(const u64* t, u64* out) const {
        u64 d[MAXL];
        u64 borrow = 0;
        for (int j = 0; j < L; j++) {
            u64 s = t[j] - mod[j] - borrow;      // limbs < 2^52: no wrap
            borrow = (s >> 63) & 1;              // negative iff top bit
            d[j] = s & M52;
        }
        bool ge = t[L] >= borrow;
        for (int j = 0; j < L; j++) out[j] = ge ? d[j] : t[j];
        for (int j = L; j < MAXL; j++) out[j] = 0;
    }

    void add(const u64* a, const u64* b, u64* out) const {
        u64 t[MAXL + 1];
        u64 carry = 0;
        for (int j = 0; j < L; j++) {
            u64 s = a[j] + b[j] + carry;
            t[j] = s & M52;
            carry = s >> 52;
        }
        t[L] = carry;
        cond_sub(t, out);
    }

    void sub(const u64* a, const u64* b, u64* out) const {
        u64 d[MAXL];
        u64 borrow = 0;
        for (int j = 0; j < L; j++) {
            u64 s = a[j] - b[j] - borrow;
            borrow = (s >> 63) & 1;
            d[j] = s & M52;
        }
        if (borrow) {
            u64 carry = 0;
            for (int j = 0; j < L; j++) {
                u64 s = d[j] + mod[j] + carry;
                out[j] = s & M52;
                carry = s >> 52;
            }
        } else {
            for (int j = 0; j < L; j++) out[j] = d[j];
        }
        for (int j = L; j < MAXL; j++) out[j] = 0;
    }

    void mul_small(const u64* a, u64 k, u64* out) const {
        u64 acc[MAXL];
        int top = 63;
        while (top > 0 && !((k >> top) & 1)) top--;
        for (int j = 0; j < MAXL; j++) acc[j] = a[j];
        for (int b = top - 1; b >= 0; b--) {
            add(acc, acc, acc);
            if ((k >> b) & 1) add(acc, a, acc);
        }
        for (int j = 0; j < MAXL; j++) out[j] = acc[j];
    }

    bool is_zero(const u64* a) const {
        for (int j = 0; j < L; j++) if (a[j]) return false;
        return true;
    }

    // ---- 64-bit ABI <-> 52-limb plain repacking ----
    void repack_from64(const u64* src, u64* out) const {
        for (int j = 0; j < L; j++) {
            int bit = 52 * j;
            int w = bit >> 6, sh = bit & 63;
            u64 v = src[w] >> sh;
            if (sh && w + 1 < L64) v |= src[w + 1] << (64 - sh);
            out[j] = v & M52;
        }
        for (int j = L; j < MAXL; j++) out[j] = 0;
    }
    void repack_to64(const u64* a, u64* dst) const {
        for (int j = 0; j < L64; j++) dst[j] = 0;
        for (int j = 0; j < L; j++) {
            int bit = 52 * j;
            int w = bit >> 6, sh = bit & 63;
            dst[w] |= a[j] << sh;
            if (sh > 12 && w + 1 < L64) dst[w + 1] |= a[j] >> (64 - sh);
        }
    }
    void abi_to_mont(const u64* src, u64* out) const {
        u64 tmp[MAXL];
        repack_from64(src, tmp);
        mont_mul(tmp, r2, out);
    }
    void mont_to_abi(const u64* a, u64* dst) const {
        u64 one[MAXL] = {1};
        u64 tmp[MAXL];
        mont_mul(a, one, tmp);
        repack_to64(tmp, dst);
    }
};

// ---------------------------------------------------------------------------
// Engine 3: 8-way VERTICAL IFMA — one zmm lane per independent multiply.
//
// The 1-way Field52 kernel is latency-bound (the per-iteration m feedback
// chain plus lane extracts).  The vertical form runs 8 INDEPENDENT
// Montgomery multiplies with limb j of all 8 elements in vector T[j]:
// every op is lane-parallel, there are no cross-lane shifts or extracts,
// and the m-step is itself one vpmadd52lo.  Used by the Pippenger bucket
// accumulation (a conflict-checked 8-slot queue of independent bucket
// adds) and the window combine (8 windows' serial chains run side by side).
// ---------------------------------------------------------------------------

#if defined(__x86_64__)

#define BP_TGT __attribute__((target("avx512f,avx512ifma,avx512vl,avx512dq")))

struct Vec8 { __m512i v[MAXL]; };         // limb j of 8 elements in v[j]

struct F52x8 {
    const Field52* f;
    __m512i P[MAXL];                      // broadcast p limbs? no: shared
    __m512i n0;                           // broadcast n0inv
    __m512i m52;

    BP_TGT void init(const Field52& fld) {
        f = &fld;
        for (int j = 0; j < MAXL; j++)
            P[j] = _mm512_set1_epi64((long long)fld.mod[j]);
        n0 = _mm512_set1_epi64((long long)fld.n0inv);
        m52 = _mm512_set1_epi64((long long)M52);
    }

    // OUT = A*B*R^-1 mod p, 8 independent lanes
    BP_TGT void mont_mul(const Vec8& A, const Vec8& B, Vec8& OUT) const {
        const int K = f->L;
        const __m512i Z = _mm512_setzero_si512();
        __m512i T[MAXL + 1];
        for (int j = 0; j <= K; j++) T[j] = Z;
        for (int i = 0; i < K; i++) {
            const __m512i ai = A.v[i];
            for (int j = 0; j < K; j++) {
                T[j] = _mm512_madd52lo_epu64(T[j], ai, B.v[j]);
                T[j + 1] = _mm512_madd52hi_epu64(T[j + 1], ai, B.v[j]);
            }
            const __m512i m = _mm512_madd52lo_epu64(
                Z, _mm512_and_epi64(T[0], m52), n0);
            for (int j = 0; j < K; j++) {
                T[j] = _mm512_madd52lo_epu64(T[j], m, P[j]);
                T[j + 1] = _mm512_madd52hi_epu64(T[j + 1], m, P[j]);
            }
            // low 52 bits of T[0] are now zero: fold its carry into T[1],
            // then shift the window down one limb
            T[1] = _mm512_add_epi64(T[1], _mm512_srli_epi64(T[0], 52));
            for (int j = 0; j < K; j++) T[j] = T[j + 1];
            T[K] = Z;
        }
        // resolve deferred carries (values < 2^58 per lane)
        for (int j = 0; j < K; j++) {
            T[j + 1] = _mm512_add_epi64(T[j + 1],
                                        _mm512_srli_epi64(T[j], 52));
            T[j] = _mm512_and_epi64(T[j], m52);
        }
        cond_sub(T, OUT);
    }

    // OUT = T mod p given canonical T[0..K-1] + tiny top T[K]
    BP_TGT void cond_sub(const __m512i* T, Vec8& OUT) const {
        const int K = f->L;
        __m512i D[MAXL];
        __m512i bw = _mm512_setzero_si512();
        for (int j = 0; j < K; j++) {
            __m512i s = _mm512_sub_epi64(
                T[j], _mm512_add_epi64(P[j], bw));
            bw = _mm512_srli_epi64(s, 63);
            D[j] = _mm512_and_epi64(s, m52);
        }
        __mmask8 ge = _mm512_cmpge_epu64_mask(T[K], bw);
        for (int j = 0; j < K; j++)
            OUT.v[j] = _mm512_mask_blend_epi64(ge, T[j], D[j]);
        for (int j = K; j < MAXL; j++) OUT.v[j] = _mm512_setzero_si512();
    }

    BP_TGT void add(const Vec8& A, const Vec8& B, Vec8& OUT) const {
        const int K = f->L;
        __m512i T[MAXL + 1];
        __m512i c = _mm512_setzero_si512();
        for (int j = 0; j < K; j++) {
            __m512i s = _mm512_add_epi64(_mm512_add_epi64(A.v[j], B.v[j]),
                                         c);
            T[j] = _mm512_and_epi64(s, m52);
            c = _mm512_srli_epi64(s, 52);
        }
        T[K] = c;
        cond_sub(T, OUT);
    }

    BP_TGT void sub(const Vec8& A, const Vec8& B, Vec8& OUT) const {
        const int K = f->L;
        __m512i D[MAXL];
        __m512i bw = _mm512_setzero_si512();
        for (int j = 0; j < K; j++) {
            __m512i s = _mm512_sub_epi64(
                A.v[j], _mm512_add_epi64(B.v[j], bw));
            bw = _mm512_srli_epi64(s, 63);
            D[j] = _mm512_and_epi64(s, m52);
        }
        // lanes with borrow add p back
        __mmask8 neg = _mm512_cmpneq_epu64_mask(bw,
                                                _mm512_setzero_si512());
        __m512i c = _mm512_setzero_si512();
        for (int j = 0; j < K; j++) {
            __m512i s = _mm512_add_epi64(_mm512_add_epi64(D[j], P[j]), c);
            c = _mm512_srli_epi64(s, 52);
            OUT.v[j] = _mm512_mask_blend_epi64(
                neg, D[j], _mm512_and_epi64(s, m52));
        }
        for (int j = K; j < MAXL; j++) OUT.v[j] = _mm512_setzero_si512();
    }

    BP_TGT void mul_small(const Vec8& A, u64 k, Vec8& OUT) const {
        Vec8 acc = A;
        int top = 63;
        while (top > 0 && !((k >> top) & 1)) top--;
        for (int b = top - 1; b >= 0; b--) {
            add(acc, acc, acc);
            if ((k >> b) & 1) add(acc, A, acc);
        }
        OUT = acc;
    }
};

struct Pt8 { Vec8 X, Y, Z; };

// transpose-in: lane l of OUT limb j = src[l][j]
BP_TGT static void gather8(const u64* const src[8], Vec8& out, int K) {
    alignas(64) u64 tmp[8];
    for (int j = 0; j < K; j++) {
        for (int l = 0; l < 8; l++) tmp[l] = src[l][j];
        out.v[j] = _mm512_load_si512((const void*)tmp);
    }
    for (int j = K; j < MAXL; j++) out.v[j] = _mm512_setzero_si512();
}

BP_TGT static void scatter8(const Vec8& in, u64* const dst[8], int K) {
    alignas(64) u64 tmp[8];
    for (int j = 0; j < K; j++) {
        _mm512_store_si512((void*)tmp, in.v[j]);
        for (int l = 0; l < 8; l++) dst[l][j] = tmp[l];
    }
}

// 8 independent mixed complete adds (a = 0): R[l] = P[l] + Q[l]
BP_TGT static void pt_add_mixed8(const F52x8& f, u64 b3,
                                 const Pt8& P, const Vec8& QX,
                                 const Vec8& QY, Pt8& R) {
    Vec8 t0, t1, xy, yz, xz, sa, sb, m, n, tmp, tmp2, b3t2;
    f.mont_mul(P.X, QX, t0);
    f.mont_mul(P.Y, QY, t1);
    f.add(P.X, P.Y, sa); f.add(QX, QY, sb);
    f.mont_mul(sa, sb, xy); f.sub(xy, t0, xy); f.sub(xy, t1, xy);
    f.mont_mul(QY, P.Z, tmp); f.add(P.Y, tmp, yz);
    f.mont_mul(QX, P.Z, tmp); f.add(P.X, tmp, xz);
    f.mul_small(P.Z, b3, b3t2);
    f.sub(t1, b3t2, m);
    f.add(t1, b3t2, n);
    f.mont_mul(yz, xz, tmp); f.mul_small(tmp, b3, tmp);
    f.mont_mul(xy, m, tmp2); f.sub(tmp2, tmp, R.X);
    f.mont_mul(t0, xz, tmp); f.mul_small(tmp, 3 * b3, tmp);
    f.mont_mul(n, m, tmp2); f.add(tmp2, tmp, R.Y);
    f.mont_mul(t0, xy, tmp); f.mul_small(tmp, 3, tmp);
    f.mont_mul(yz, n, tmp2); f.add(tmp2, tmp, R.Z);
}

// 8 independent complete doublings (a = 0): R[l] = 2*P[l]
// (Renes-Costello-Batina 2016 algorithm 9: 8 muls + 1 small-mul vs the
// 12 + 2 of the generic complete add — the fold ladders' shared-doubling
// step is half their op count)
BP_TGT static void pt_dbl8(const F52x8& f, u64 b3, const Pt8& P, Pt8& R) {
    Vec8 t0, t1, t2, x3, y3, z3;
    f.mont_mul(P.Y, P.Y, t0);
    f.add(t0, t0, z3); f.add(z3, z3, z3); f.add(z3, z3, z3);   // 8Y^2
    f.mont_mul(P.Y, P.Z, t1);
    f.mont_mul(P.Z, P.Z, t2);
    f.mul_small(t2, b3, t2);
    f.mont_mul(t2, z3, x3);
    f.add(t0, t2, y3);
    f.mont_mul(t1, z3, z3);
    f.add(t2, t2, t1); f.add(t1, t2, t2);
    f.sub(t0, t2, t0);
    f.mont_mul(t0, y3, y3);
    f.add(x3, y3, y3);
    f.mont_mul(P.X, P.Y, t1);
    f.mont_mul(t0, t1, x3);
    f.add(x3, x3, x3);
    R.X = x3; R.Y = y3; R.Z = z3;
}

// 8 independent full complete adds (a = 0): R[l] = P[l] + Q[l]
BP_TGT static void pt_add8(const F52x8& f, u64 b3, const Pt8& P,
                           const Pt8& Q, Pt8& R) {
    Vec8 t0, t1, t2, xy, yz, xz, sa, sb, m, n, tmp, tmp2, b3t2;
    f.mont_mul(P.X, Q.X, t0);
    f.mont_mul(P.Y, Q.Y, t1);
    f.mont_mul(P.Z, Q.Z, t2);
    f.add(P.X, P.Y, sa); f.add(Q.X, Q.Y, sb);
    f.mont_mul(sa, sb, xy); f.sub(xy, t0, xy); f.sub(xy, t1, xy);
    f.add(P.Y, P.Z, sa); f.add(Q.Y, Q.Z, sb);
    f.mont_mul(sa, sb, yz); f.sub(yz, t1, yz); f.sub(yz, t2, yz);
    f.add(P.X, P.Z, sa); f.add(Q.X, Q.Z, sb);
    f.mont_mul(sa, sb, xz); f.sub(xz, t0, xz); f.sub(xz, t2, xz);
    f.mul_small(t2, b3, b3t2);
    f.sub(t1, b3t2, m);
    f.add(t1, b3t2, n);
    f.mont_mul(yz, xz, tmp); f.mul_small(tmp, b3, tmp);
    f.mont_mul(xy, m, tmp2); f.sub(tmp2, tmp, R.X);
    f.mont_mul(t0, xz, tmp); f.mul_small(tmp, 3 * b3, tmp);
    f.mont_mul(n, m, tmp2); f.add(tmp2, tmp, R.Y);
    f.mont_mul(t0, xy, tmp); f.mul_small(tmp, 3, tmp);
    f.mont_mul(yz, n, tmp2); f.add(tmp2, tmp, R.Z);
}

#endif  // __x86_64__

static bool ifma_available() {
#if defined(__x86_64__)
    static int cpu_ok = -1;
    if (cpu_ok < 0)
        cpu_ok = __builtin_cpu_supports("avx512ifma") &&
                 __builtin_cpu_supports("avx512f") ? 1 : 0;
    // env re-read per call: lets one process race both engines (bench.py
    // measures the portable path as the AMCL-class baseline denominator)
    const char* env = getenv("BP_NATIVE_IFMA");
    if (env && env[0] == '0') return false;
    return cpu_ok == 1;
#else
    return false;
#endif
}

// ---------------------------------------------------------------------------
// Curve + point ops, templated over the field engine
// ---------------------------------------------------------------------------

template <class F>
struct CurveT {
    F fp;
    int Lr;                 // scalar limb count (plain form scalars)
    u64 b3;                 // 3*b as a small integer (a = 0 curves)
    u64 one_m[MAXL];        // Montgomery 1 in fp
    bool a_nonzero;         // general Weierstrass a != 0 (ed25519)
    u64 a_m[MAXL];          // a   in Montgomery form
    u64 a2_m[MAXL];         // a^2 in Montgomery form
    u64 b3_m[MAXL];         // 3b  in Montgomery form
};

struct Pt { u64 X[MAXL], Y[MAXL], Z[MAXL]; };
struct PtAff { u64 X[MAXL], Y[MAXL]; };

template <class F>
static void pt_identity(const CurveT<F>& c, Pt& p) {
    memset(&p, 0, sizeof(Pt));
    for (int j = 0; j < MAXL; j++) p.Y[j] = c.one_m[j];
}

// Complete projective add, RCB16 (same formulas as ops/ec_host.py):
// the a=0 specialization (algorithm 7) for the pairing curves/secp256k1,
// the general-a algorithm 1 for ed25519's Weierstrass form.
template <class F>
static void pt_add(const CurveT<F>& c, const Pt& P, const Pt& Q, Pt& R) {
    const F& f = c.fp;
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

// Mixed complete add (Z2 = 1, a = 0 curves): saves the Z1*Z2 product and
// turns yz/xz into single multiplies (11 Montgomery muls vs 12 + cheaper
// add chains).  Still complete in P (identity P handled; affine Q cannot
// encode the identity — the MSM driver zeroes identity points' scalars so
// they are never scheduled).
template <class F>
static void pt_add_mixed(const CurveT<F>& c, const Pt& P, const PtAff& Q,
                         Pt& R) {
    const F& f = c.fp;
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

// digit w of the base-2^cbits decomposition: a two-word windowed read
// (replaces the bit-by-bit loop — ~cbits x fewer ops in the Pippenger
// scheduling pass)
static inline u64 scalar_digit(const u64* k, int Lr, int w, int cbits) {
    int bit = w * cbits;
    int word = bit >> 6, sh = bit & 63;
    u64 v = k[word] >> sh;
    if (sh + cbits > 64 && word + 1 < Lr) v |= k[word + 1] << (64 - sh);
    return v & (((u64)1 << cbits) - 1);
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

template <class F>
static void pt_scalar_mul(const CurveT<F>& c, const Pt& P, const u64* k,
                          Pt& R) {
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

static CurveT<Field> load_curve(const u64* p) {
    CurveT<Field> c;
    memset(&c, 0, sizeof(c));
    c.fp.L = (int)p[0];
    c.fp.L64 = c.fp.L;
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

// ---- bignum helpers for deriving the 52-limb constants at load time ----

static int field52_limbs(const Field& f64) {
    int bits = 0;
    for (int j = f64.L - 1; j >= 0; j--) {
        if (f64.mod[j]) { bits = j * 64 + 64; u64 v = f64.mod[j];
            while (!(v >> 63)) { v <<= 1; bits--; } break; }
    }
    return (bits + 51) / 52;
}

// Build the 52-limb engine + curve constants from the 64-bit curve.
static CurveT<Field52> to52(const CurveT<Field>& c64) {
    CurveT<Field52> c;
    memset(&c, 0, sizeof(c));
    const Field& f64 = c64.fp;
    Field52& f = c.fp;
    f.L64 = f64.L;
    f.L = field52_limbs(f64);
    f.repack_from64(f64.mod, f.mod);     // repack uses L/L64 set above

    // n0inv = -p^-1 mod 2^52 (Newton iteration in 2^64, then mask)
    u64 inv = f64.mod[0];                // p odd: converges to p^-1 mod 2^64
    for (int i = 0; i < 6; i++) inv *= 2 - f64.mod[0] * inv;
    f.n0inv = ((u64)0 - inv) & M52;

    // r2 = (2^(52L))^2 mod p by 104L modular doublings of 1
    u64 v[MAXL + 1];
    memset(v, 0, sizeof(v));
    v[0] = 1;
    for (int i = 0; i < 104 * f.L; i++) {
        u64 carry = 0;
        for (int j = 0; j < f.L; j++) {
            u64 s = (v[j] << 1) | carry;
            v[j] = s & M52;
            carry = (s >> 52) & 1;
        }
        v[f.L] = carry;
        f.cond_sub(v, v);
        v[f.L] = 0;
    }
    memcpy(f.r2, v, sizeof(f.r2));

    // curve constants: convert via plain 64-limb ABI form
    u64 plain[MAXL];
    f64.mont_to_abi(c64.one_m, plain);   // == 1
    f.abi_to_mont(plain, c.one_m);
    c.Lr = c64.Lr;
    c.b3 = c64.b3;
    c.a_nonzero = c64.a_nonzero;
    if (c.a_nonzero) {
        f64.mont_to_abi(c64.a_m, plain);  f.abi_to_mont(plain, c.a_m);
        f64.mont_to_abi(c64.a2_m, plain); f.abi_to_mont(plain, c.a2_m);
        f64.mont_to_abi(c64.b3_m, plain); f.abi_to_mont(plain, c.b3_m);
    }
    return c;
}

template <class F>
static void load_pt(const CurveT<F>& c, const u64* src, Pt& p) {
    memset(&p, 0, sizeof(Pt));
    int L = c.fp.L64;
    c.fp.abi_to_mont(src, p.X);
    c.fp.abi_to_mont(src + L, p.Y);
    c.fp.abi_to_mont(src + 2 * L, p.Z);
}

template <class F>
static void store_pt(const CurveT<F>& c, const Pt& p, u64* dst) {
    int L = c.fp.L64;
    c.fp.mont_to_abi(p.X, dst);
    c.fp.mont_to_abi(p.Y, dst + L);
    c.fp.mont_to_abi(p.Z, dst + 2 * L);
}

// ---------------------------------------------------------------------------
// Entry-point bodies (templated; extern "C" wrappers dispatch on IFMA)
// ---------------------------------------------------------------------------

// out = sum_i scalars[i] * points[i]  (Pippenger, var-time; ct = constant
// WORK: full-width window count, zero digits bucketed into the discarded
// slot 0 — see msm_ifma8_signed's ct note)
// `points` are AFFINE (x, y) pairs (the Python driver batch-normalizes and
// zeroes the scalars of identity points); bucket accumulation uses mixed
// adds on a=0 curves.
template <class F>
static void msm_impl(const CurveT<F>& c, const u64* points,
                     const u64* scalars, u64 n, u64* out, bool ct = false) {
    int L = c.fp.L64, Lr = c.Lr;

    std::vector<PtAff> pts(n);
    for (u64 i = 0; i < n; i++) {
        memset(&pts[i], 0, sizeof(PtAff));
        c.fp.abi_to_mont(points + i * 2 * L, pts[i].X);
        c.fp.abi_to_mont(points + i * 2 * L + L, pts[i].Y);
    }

    int maxbits = ct ? Lr * 64 : 0;
    for (u64 i = 0; !ct && i < n; i++) {
        int b = scalar_bits(scalars + i * Lr, Lr);
        if (b > maxbits) maxbits = b;
    }
    Pt total; pt_identity(c, total);
    if (maxbits == 0) { store_pt(c, total, out); return; }

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
    memset(&full_q, 0, sizeof(full_q));
    for (int j = 0; j < MAXL; j++) full_q.Z[j] = c.one_m[j];

    for (int w = nwin - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) pt_add(c, total, total, total);
        std::fill(used.begin(), used.end(), false);
        for (u64 i = 0; i < n; i++) {
            const u64* k = scalars + i * Lr;
            const u64 dig = scalar_digit(k, Lr, w, cbits);
            if (!dig && !ct) continue;
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
                for (int j = 0; j < MAXL; j++)
                    buckets[dig].Z[j] = c.one_m[j];
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

#if defined(__x86_64__)

// 8-way IFMA Pippenger (a = 0 curves): buckets are identity-initialized so
// every scheduled point-window is an unconditional complete mixed add; a
// conflict-checked 8-slot queue batches independent bucket adds into one
// vertical pt_add_mixed8; the per-window bucket combine (two serial
// running sums) runs 8 windows side by side.
BP_TGT
static void msm_ifma8(const CurveT<Field52>& c, const u64* points,
                      const u64* scalars, u64 n, u64* out) {
    const int L = c.fp.L64, Lr = c.Lr;
    F52x8 fx; fx.init(c.fp);

    std::vector<PtAff> pts(n);
    for (u64 i = 0; i < n; i++) {
        memset(&pts[i], 0, sizeof(PtAff));
        c.fp.abi_to_mont(points + i * 2 * L, pts[i].X);
        c.fp.abi_to_mont(points + i * 2 * L + L, pts[i].Y);
    }

    int maxbits = 0;
    for (u64 i = 0; i < n; i++) {
        int b = scalar_bits(scalars + i * Lr, Lr);
        if (b > maxbits) maxbits = b;
    }
    Pt total; pt_identity(c, total);
    if (maxbits == 0) { store_pt(c, total, out); return; }

    // batched accumulation shifts the cost balance toward the combine:
    // swept on this host with the x8 engine (round 3: n=2048 c=8 38 ms,
    // n=4160 c=8 67 ms, n=16384 c=10 197 ms, n=65536 c=11 0.65 s)
    int cbits;
    if (n < 128) cbits = 4;
    else if (n < 512) cbits = 6;
    else if (n < 8192) cbits = 8;
    else if (n < 32768) cbits = 10;
    else cbits = 11;
    const char* ov = getenv("BP_CPP_WINDOW");
    if (ov && ov[0]) {
        int v = atoi(ov);
        if (v >= 1 && v <= 16) cbits = v;
    }

    const int nwin = (maxbits + cbits - 1) / cbits;
    const u64 nbuckets = (u64)1 << cbits;
    std::vector<Pt> buckets(nwin * nbuckets);
    for (auto& b : buckets) pt_identity(c, b);

    // ---- phase A: bucket accumulation via the 8-slot queue ----
    Pt* qb[8];            // pending bucket pointers
    const PtAff* qp[8];   // pending points
    int pend = 0;

    auto flush = [&]() {
        if (pend == 8) {
            const u64* bx[8]; const u64* by[8]; const u64* bz[8];
            const u64* qx[8]; const u64* qy[8];
            u64* ox[8]; u64* oy[8]; u64* oz[8];
            for (int l = 0; l < 8; l++) {
                bx[l] = qb[l]->X; by[l] = qb[l]->Y; bz[l] = qb[l]->Z;
                qx[l] = qp[l]->X; qy[l] = qp[l]->Y;
                ox[l] = qb[l]->X; oy[l] = qb[l]->Y; oz[l] = qb[l]->Z;
            }
            Pt8 P8; Vec8 QX, QY;
            const int K = c.fp.L;
            gather8(bx, P8.X, K); gather8(by, P8.Y, K);
            gather8(bz, P8.Z, K);
            gather8(qx, QX, K); gather8(qy, QY, K);
            pt_add_mixed8(fx, c.b3, P8, QX, QY, P8);
            scatter8(P8.X, ox, K); scatter8(P8.Y, oy, K);
            scatter8(P8.Z, oz, K);
        } else {
            for (int l = 0; l < pend; l++)
                pt_add_mixed(c, *qb[l], *qp[l], *qb[l]);
        }
        pend = 0;
    };

    const u64 PF = 24;     // prefetch lookahead (points ahead)
    for (int w = 0; w < nwin; w++) {
        Pt* bw = buckets.data() + (u64)w * nbuckets;
        for (u64 i = 0; i < n; i++) {
            // the bucket array exceeds L2 at production window sizes:
            // prefetch the bucket of point i+PF so its random-access miss
            // latency overlaps the ~3 flushes in between
            if (i + PF < n) {
                u64 dpf = scalar_digit(scalars + (i + PF) * Lr, Lr, w,
                                       cbits);
                __builtin_prefetch((const char*)(bw + dpf), 1);
                __builtin_prefetch((const char*)(bw + dpf) + 64, 1);
                __builtin_prefetch((const char*)(bw + dpf) + 128, 1);
            }
            const u64* k = scalars + i * Lr;
            const u64 dig = scalar_digit(k, Lr, w, cbits);
            if (!dig) continue;
            Pt* slot = bw + dig;
            bool conflict = false;
            for (int l = 0; l < pend; l++)
                if (qb[l] == slot) { conflict = true; break; }
            if (conflict || pend == 8) flush();
            qb[pend] = slot; qp[pend] = &pts[i]; pend++;
        }
        flush();           // window boundary (bucket pointers stay valid,
                           // but keep rounds deterministic per window)
    }

    // ---- phase B: per-window weighted bucket sums, 8 windows at once ----
    std::vector<Pt> totals(nwin);
    int w0 = 0;
    for (; w0 + 8 <= nwin; w0 += 8) {
        Pt run[8], sub[8];
        for (int l = 0; l < 8; l++) {
            pt_identity(c, run[l]);
            pt_identity(c, sub[l]);
        }
        Pt8 RUN, SUB;
        const int K = c.fp.L;
        {
            const u64* rx[8]; const u64* ry[8]; const u64* rz[8];
            for (int l = 0; l < 8; l++) {
                rx[l] = run[l].X; ry[l] = run[l].Y; rz[l] = run[l].Z;
            }
            gather8(rx, RUN.X, K); gather8(ry, RUN.Y, K);
            gather8(rz, RUN.Z, K);
            SUB = RUN;
        }
        for (u64 d = nbuckets - 1; d >= 1; d--) {
            const u64* bx[8]; const u64* by[8]; const u64* bz[8];
            for (int l = 0; l < 8; l++) {
                const Pt& b = buckets[(u64)(w0 + l) * nbuckets + d];
                bx[l] = b.X; by[l] = b.Y; bz[l] = b.Z;
            }
            Pt8 B8;
            gather8(bx, B8.X, K); gather8(by, B8.Y, K);
            gather8(bz, B8.Z, K);
            pt_add8(fx, c.b3, RUN, B8, RUN);
            pt_add8(fx, c.b3, SUB, RUN, SUB);
        }
        {
            u64* sx[8]; u64* sy[8]; u64* sz[8];
            for (int l = 0; l < 8; l++) {
                sx[l] = totals[w0 + l].X; sy[l] = totals[w0 + l].Y;
                sz[l] = totals[w0 + l].Z;
            }
            scatter8(SUB.X, sx, K); scatter8(SUB.Y, sy, K);
            scatter8(SUB.Z, sz, K);
        }
    }
    for (; w0 < nwin; w0++) {               // remainder windows, 1-way
        Pt running, subtotal;
        pt_identity(c, running);
        pt_identity(c, subtotal);
        const Pt* bw = buckets.data() + (u64)w0 * nbuckets;
        for (u64 d = nbuckets - 1; d >= 1; d--) {
            pt_add(c, running, bw[d], running);
            pt_add(c, subtotal, running, subtotal);
        }
        totals[w0] = subtotal;
    }

    // ---- Horner over windows (serial tail) ----
    for (int w = nwin - 1; w >= 0; w--) {
        for (int d = 0; d < cbits; d++) pt_add(c, total, total, total);
        pt_add(c, total, totals[w], total);
    }
    store_pt(c, total, out);
}

#endif  // __x86_64__

template <class F>
static void fold_impl(const CurveT<F>& c, const u64* PL, const u64* PR,
                      const u64* s1, const u64* s2, u64 n, u64* out);

#if defined(__x86_64__)

// 8 independent Straus ladders at once (a = 0 curves): lanes share the
// doubling step (pt_add8 acc,acc); each lane's per-bit operand is selected
// from its {identity, A, B, A+B} table and gathered into vertical form.
// Complete formulas make the sel==0 identity-add branch-free.
BP_TGT
static void fold_impl8(const CurveT<Field52>& c, const u64* PL,
                       const u64* PR, const u64* s1, const u64* s2,
                       u64 n, u64* out) {
    const int L = c.fp.L64, Lr = c.Lr;
    const int K = c.fp.L;
    F52x8 fx; fx.init(c.fp);
    u64 i0 = 0;
    for (; i0 + 8 <= n; i0 += 8) {
        Pt tab[8][4];                 // [id, A, B, A+B] per lane
        int bits = 0;
        for (int l = 0; l < 8; l++) {
            pt_identity(c, tab[l][0]);
            load_pt(c, PL + (i0 + l) * 3 * L, tab[l][1]);
            load_pt(c, PR + (i0 + l) * 3 * L, tab[l][2]);
            pt_add(c, tab[l][1], tab[l][2], tab[l][3]);
            int b1 = scalar_bits(s1 + (i0 + l) * Lr, Lr);
            int b2 = scalar_bits(s2 + (i0 + l) * Lr, Lr);
            if (b1 > bits) bits = b1;
            if (b2 > bits) bits = b2;
        }
        Pt8 ACC;
        {
            Pt id8[8];
            const u64* px[8]; const u64* py[8]; const u64* pz[8];
            for (int l = 0; l < 8; l++) {
                pt_identity(c, id8[l]);
                px[l] = id8[l].X; py[l] = id8[l].Y; pz[l] = id8[l].Z;
            }
            gather8(px, ACC.X, K); gather8(py, ACC.Y, K);
            gather8(pz, ACC.Z, K);
        }
        for (int bi = bits - 1; bi >= 0; bi--) {
            pt_dbl8(fx, c.b3, ACC, ACC);               // shared doubling
            const u64* qx[8]; const u64* qy[8]; const u64* qz[8];
            for (int l = 0; l < 8; l++) {
                int sel = scalar_bit(s1 + (i0 + l) * Lr, Lr, bi)
                        | (scalar_bit(s2 + (i0 + l) * Lr, Lr, bi) << 1);
                qx[l] = tab[l][sel].X;
                qy[l] = tab[l][sel].Y;
                qz[l] = tab[l][sel].Z;
            }
            Pt8 Q;
            gather8(qx, Q.X, K); gather8(qy, Q.Y, K); gather8(qz, Q.Z, K);
            pt_add8(fx, c.b3, ACC, Q, ACC);
        }
        {
            Pt res[8];
            u64* rx[8]; u64* ry[8]; u64* rz[8];
            for (int l = 0; l < 8; l++) {
                memset(&res[l], 0, sizeof(Pt));
                rx[l] = res[l].X; ry[l] = res[l].Y; rz[l] = res[l].Z;
            }
            scatter8(ACC.X, rx, K); scatter8(ACC.Y, ry, K);
            scatter8(ACC.Z, rz, K);
            for (int l = 0; l < 8; l++)
                store_pt(c, res[l], out + (i0 + l) * 3 * L);
        }
    }
    if (i0 < n)                        // remainder lanes, 1-way
        fold_impl(c, PL + i0 * 3 * L, PR + i0 * 3 * L, s1 + i0 * Lr,
                  s2 + i0 * Lr, n - i0, out + i0 * 3 * L);
}

#endif  // __x86_64__

// out[i] = s1[i]*PL[i] + s2[i]*PR[i]  (Straus shared-doubling ladder)
template <class F>
static void fold_impl(const CurveT<F>& c, const u64* PL, const u64* PR,
                      const u64* s1, const u64* s2, u64 n, u64* out) {
    int L = c.fp.L64, Lr = c.Lr;
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

template <class F>
static void scalar_mul_batch_impl(const CurveT<F>& c, const u64* P,
                                  const u64* k, u64 n, u64* out) {
    int L = c.fp.L64;
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
template <class F>
static void combine_rowcol_impl(const CurveT<F>& c, const u64* rowsum,
                                const u64* colsum, u64 nwin, u64 gsize,
                                u64 ksize, u64 cbits, u64 wins_per_set,
                                u64* out) {
    int L = c.fp.L64;
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

// Horner window combine over PRECOMPUTED per-window totals (the device
// now finishes the weighted bucket sums itself — window-parallel short
// chains — so only W points per set cross the tunnel; ~32x fewer bytes
// than the rowcol scheme).  nwin = nsets * wins_per_set.
template <class F>
static void combine_totals_impl(const CurveT<F>& c, const u64* totals,
                                u64 nwin, u64 cbits, u64 wins_per_set,
                                u64* out) {
    int L = c.fp.L64;
    u64 nsets = nwin / wins_per_set;
    for (u64 s = 0; s < nsets; s++) {
        Pt acc, t;
        pt_identity(c, acc);
        for (u64 wi = wins_per_set; wi-- > 0;) {
            for (u64 d = 0; d < cbits; d++) pt_add(c, acc, acc, acc);
            load_pt(c, totals + (s * wins_per_set + wi) * 3 * L, t);
            pt_add(c, acc, t, acc);
        }
        store_pt(c, acc, out + s * 3 * L);
    }
}

template <class F>
static void add_batch_impl(const CurveT<F>& c, const u64* P, const u64* Q,
                           u64 n, u64* out) {
    int L = c.fp.L64;
    for (u64 i = 0; i < n; i++) {
        Pt p, q, r;
        load_pt(c, P + i * 3 * L, p);
        load_pt(c, Q + i * 3 * L, q);
        pt_add(c, p, q, r);
        store_pt(c, r, out + i * 3 * L);
    }
}

// 4-term fold: out[i] = s1[i]*P1[i] + s2[i]*P2[i] + s3[i]*P3[i] +
// s4[i]*P4[i] — one IPA round PAIR's combined base fold (`ipp.rs:119-130`
// applied twice).  Straus ladder over a 16-entry joint table; full-width
// scalars (the u-product coefficients are full width, so GLV splitting
// would need a 256-entry table for the same ladder depth — not worth it).
template <class F>
static void fold4_impl(const CurveT<F>& c, const u64* P1, const u64* P2,
                       const u64* P3, const u64* P4, const u64* s1,
                       const u64* s2, const u64* s3, const u64* s4,
                       u64 n, u64* out) {
    const int L = c.fp.L64, Lr = c.Lr;
    for (u64 i = 0; i < n; i++) {
        Pt tab[16];
        pt_identity(c, tab[0]);
        load_pt(c, P1 + i * 3 * L, tab[1]);
        load_pt(c, P2 + i * 3 * L, tab[2]);
        load_pt(c, P3 + i * 3 * L, tab[4]);
        load_pt(c, P4 + i * 3 * L, tab[8]);
        for (int e = 3; e < 16; e++) {
            if ((e & (e - 1)) == 0) continue;
            const int lo = e & (-e);
            pt_add(c, tab[e - lo], tab[lo], tab[e]);
        }
        const u64* ks[4] = {s1 + i * Lr, s2 + i * Lr, s3 + i * Lr,
                            s4 + i * Lr};
        int bits = 1;
        for (int j = 0; j < 4; j++) {
            int b = scalar_bits(ks[j], Lr);
            if (b > bits) bits = b;
        }
        Pt acc;
        pt_identity(c, acc);
        for (int bi = bits - 1; bi >= 0; bi--) {
            pt_add(c, acc, acc, acc);
            int sel = scalar_bit(ks[0], Lr, bi)
                    | (scalar_bit(ks[1], Lr, bi) << 1)
                    | (scalar_bit(ks[2], Lr, bi) << 2)
                    | (scalar_bit(ks[3], Lr, bi) << 3);
            if (sel) pt_add(c, acc, tab[sel], acc);
        }
        store_pt(c, acc, out + i * 3 * L);
    }
}

// ===========================================================================
// bp_msm2: projective-input MSM.
//
// Replaces the Python-side big-int batch normalization (cpp_backend.py round
// 1/2) with an in-native Montgomery batch inversion, and upgrades the IFMA
// bucket pass to SIGNED digits (half the buckets per window — negating an
// affine point is one field subtraction, so digit -d adds (X, p-Y) to bucket
// d) plus optional GLV (k = k1 + lambda*k2 with psi(x,y) = (beta*x, y); the
// lambda/mu/beta constants are computed and validated against the host EC
// backend in cpp_backend.py and passed through `glv_params`).  This mirrors
// the variable-time MSM role of the reference's
// G1Vector::inner_product_var_time (/root/reference/src/ipp.rs:91,104;
// verifier.rs:431-456) with the standard endomorphism+signed-window
// accelerations the AMCL stack lacks.  The result is the same group element
// bit-for-bit (affine serialization) — only the addition schedule changes.
// ===========================================================================

// digit read that tolerates windows beyond the scalar's limbs (the signed
// recode scans one carry window past maxbits)
static inline u64 scalar_digit_safe(const u64* k, int Lr, int w, int cbits) {
    long bit = (long)w * cbits;
    if (bit >= (long)Lr * 64) return 0;
    int word = (int)(bit >> 6), sh = (int)(bit & 63);
    u64 v = k[word] >> sh;
    if (sh + cbits > 64 && word + 1 < Lr) v |= k[word + 1] << (64 - sh);
    return v & (((u64)1 << cbits) - 1);
}

static inline int limb_bits(const Field&)   { return 64; }
static inline int limb_bits(const Field52&) { return 52; }

// out = a^(p-2) mod p (Montgomery in/out) — the batch-inversion finisher.
// One exponentiation per MSM call: ~2*log p mont_muls, noise next to the
// bucket pass.
template <class F>
static void f_inv(const F& f, const u64* a, u64* out) {
    const int lb = limb_bits(f);
    const u64 mask = (lb == 64) ? ~(u64)0 : (((u64)1 << lb) - 1);
    u64 e[MAXL] = {0};
    u64 borrow = 2;                       // e = p - 2 in the engine's base
    for (int j = 0; j < f.L; j++) {
        u64 m = f.mod[j];
        e[j] = (m - borrow) & mask;
        borrow = (m < borrow) ? 1 : 0;
    }
    int bits = f.L * lb;
    while (bits > 0 && !((e[(bits - 1) / lb] >> ((bits - 1) % lb)) & 1))
        bits--;
    u64 acc[MAXL];
    memcpy(acc, a, sizeof(acc));          // top bit of p-2 is set (p odd > 3)
    for (int b = bits - 2; b >= 0; b--) {
        f.mont_mul(acc, acc, acc);
        if ((e[b / lb] >> (b % lb)) & 1) f.mont_mul(acc, a, acc);
    }
    memcpy(out, acc, MAXL * sizeof(u64));
}

// Projective ABI points -> Montgomery-form affine coords via one batched
// inversion (Montgomery's trick).  Identity points (Z = 0) get isid[i] = 1
// and zeroed coords; the digit pass never schedules them.
template <class F>
static void normalize_points(const CurveT<F>& c, const u64* pts_proj, u64 n,
                             u64* AX, u64* AY, std::vector<char>& isid) {
    const F& f = c.fp;
    const int L = f.L64;
    isid.assign(n, 0);
    std::vector<u64> Xm(n * MAXL), Ym(n * MAXL), Z(n * MAXL),
        pre((n + 1) * MAXL);
    memcpy(&pre[0], c.one_m, MAXL * sizeof(u64));
    for (u64 i = 0; i < n; i++) {
        f.abi_to_mont(pts_proj + i * 3 * L, &Xm[i * MAXL]);
        f.abi_to_mont(pts_proj + i * 3 * L + L, &Ym[i * MAXL]);
        f.abi_to_mont(pts_proj + i * 3 * L + 2 * L, &Z[i * MAXL]);
        if (f.is_zero(&Z[i * MAXL])) {
            isid[i] = 1;
            memcpy(&Z[i * MAXL], c.one_m, MAXL * sizeof(u64));
        }
        f.mont_mul(&pre[i * MAXL], &Z[i * MAXL], &pre[(i + 1) * MAXL]);
    }
    u64 inv_all[MAXL];
    f_inv(f, &pre[n * MAXL], inv_all);
    for (u64 i = n; i-- > 0;) {
        u64 zinv[MAXL];
        f.mont_mul(&pre[i * MAXL], inv_all, zinv);
        f.mont_mul(inv_all, &Z[i * MAXL], inv_all);
        if (isid[i]) {
            memset(AX + i * MAXL, 0, MAXL * sizeof(u64));
            memset(AY + i * MAXL, 0, MAXL * sizeof(u64));
            continue;
        }
        f.mont_mul(&Xm[i * MAXL], zinv, AX + i * MAXL);
        f.mont_mul(&Ym[i * MAXL], zinv, AY + i * MAXL);
    }
}

// ---- GLV context + 4-limb multiword helpers (u128 schoolbook) ----

struct GlvCtx {
    bool enabled;
    u64 lam[4];           // endomorphism eigenvalue (~sqrt(r) for bls381)
    u64 mu[5];            // floor(2^256 / lam), Barrett reciprocal
    u64 beta_m[MAXL];     // cube root of unity in Fp, Montgomery form
};

static inline bool mw_gte4(const u64* a, const u64* b) {
    for (int j = 3; j >= 0; j--) {
        if (a[j] != b[j]) return a[j] > b[j];
    }
    return true;
}

static inline void mw_sub4(u64* a, const u64* b) {        // a -= b
    u128 borrow = 0;
    for (int j = 0; j < 4; j++) {
        u128 s = (u128)a[j] - b[j] - borrow;
        a[j] = (u64)s;
        borrow = (s >> 64) & 1;
    }
}

// k (Lr<=4 limbs) -> k1 = k mod lam, k2 = k div lam via one Barrett
// multiply + <=3 corrections (mu = floor(2^256/lam), k < 2^256 so the
// quotient estimate floor(k*mu >> 256) is within 3 of the true quotient).
static void glv_split(const GlvCtx& g, const u64* k, int Lr,
                      u64* k1, u64* k2) {
    u64 kk[4] = {0, 0, 0, 0};
    for (int j = 0; j < Lr && j < 4; j++) kk[j] = k[j];
    u64 prod[9] = {0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 5; j++) {
            u128 s = (u128)kk[i] * g.mu[j] + prod[i + j] + carry;
            prod[i + j] = (u64)s;
            carry = s >> 64;
        }
        u64 c2 = (u64)carry;
        for (int idx = i + 5; c2 && idx < 9; idx++) {
            u128 s = (u128)prod[idx] + c2;
            prod[idx] = (u64)s;
            c2 = (u64)(s >> 64);
        }
    }
    u64 q[4] = {prod[4], prod[5], prod[6], prod[7]};      // >> 256
    u64 ql[4] = {0};                 // q*lam, exact in 4 limbs (<= k)
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; i + j < 4; j++) {
            u128 s = (u128)q[i] * g.lam[j] + ql[i + j] + carry;
            ql[i + j] = (u64)s;
            carry = s >> 64;
        }
    }
    u64 r0[4] = {kk[0], kk[1], kk[2], kk[3]};
    mw_sub4(r0, ql);
    for (int guard = 0; guard < 4 && mw_gte4(r0, g.lam); guard++) {
        mw_sub4(r0, g.lam);
        for (int j = 0; j < 4; j++) { if (++q[j]) break; }
    }
    memcpy(k1, r0, 4 * sizeof(u64));
    memcpy(k2, q, 4 * sizeof(u64));
}

// signed base-2^c recode: digits in [-(2^(c-1)-1), 2^(c-1)], written
// column-major (dst[w*stride + i]) so the per-window bucket pass streams
// them contiguously.  nwin must cover maxbits+1 (the final carry).
static void recode_signed(const u64* k, int Lr, int cbits, int nwin,
                          int16_t* dst, u64 stride, u64 i) {
    const int half = 1 << (cbits - 1);
    int carry = 0;
    for (int w = 0; w < nwin; w++) {
        int t = (int)scalar_digit_safe(k, Lr, w, cbits) + carry;
        int d;
        if (t > half) { d = t - (1 << cbits); carry = 1; }
        else          { d = t; carry = 0; }
        dst[(u64)w * stride + i] = (int16_t)d;
    }
}

#if defined(__x86_64__)

// GLV variant of the 8-way fold ladder: each lane's s1*A + s2*B becomes
// a1*A + b1*psi(A) + a2*B + b2*psi(B) with psi(X,Y,Z) = (beta*X, Y, Z) and
// s = a + lam*b the exact integer split (a = s mod lam, b = s div lam, both
// ~half-width, nonnegative), so the shared-doubling ladder runs ~129 bits
// instead of ~255.  Per-lane 16-entry tables [bit0:A, bit1:psiA, bit2:B,
// bit3:psiB]; the 11 composite entries are built with 8-way adds.  Assumes
// prime-order-subgroup inputs (same contract as the GLV MSM; the eigenvalue
// relation lam*P == psi(P) is self-tested in cpp_backend.py::glv_block).
// NG independent 8-lane groups run INTERLEAVED through the ladder: the two
// dependent pt_add8 chains per group give the OOO window more to overlap.
// Saturates at ~100 us/fold from 117 at NG=1: past that the single-port
// vpmadd52 throughput bound dominates (NG=4 measured equal to NG=2).
static const int FOLD_NG = 2;

BP_TGT
static void fold_impl8_glv(const CurveT<Field52>& c, const GlvCtx& g,
                           const u64* PL, const u64* PR,
                           const u64* s1, const u64* s2, u64 n, u64* out) {
    const int L = c.fp.L64, Lr = c.Lr;
    const int K = c.fp.L;
    F52x8 fx; fx.init(c.fp);
    u64 i0 = 0;
    for (int ng = FOLD_NG; ng >= 1; ng--) {
        const u64 lanes = (u64)ng * 8;
        for (; i0 + lanes <= n; i0 += lanes) {
            Pt tab[FOLD_NG * 8][16];
            u64 ks[FOLD_NG * 8][4][4];   // per lane: a1, b1, a2, b2
            int bits = 1;
            for (u64 l = 0; l < lanes; l++) {
                pt_identity(c, tab[l][0]);
                load_pt(c, PL + (i0 + l) * 3 * L, tab[l][1]);
                load_pt(c, PR + (i0 + l) * 3 * L, tab[l][4]);
                tab[l][2] = tab[l][1];
                c.fp.mont_mul(tab[l][1].X, g.beta_m, tab[l][2].X);
                tab[l][8] = tab[l][4];
                c.fp.mont_mul(tab[l][4].X, g.beta_m, tab[l][8].X);
                glv_split(g, s1 + (i0 + l) * Lr, Lr, ks[l][0], ks[l][1]);
                glv_split(g, s2 + (i0 + l) * Lr, Lr, ks[l][2], ks[l][3]);
                for (int j = 0; j < 4; j++) {
                    int b = scalar_bits(ks[l][j], 4);
                    if (b > bits) bits = b;
                }
            }
            for (int e = 3; e < 16; e++) {     // composite entries, 8-way
                if ((e & (e - 1)) == 0) continue;
                const int lo = e & (-e), rest = e - lo;
                Pt8 A8[FOLD_NG], B8[FOLD_NG];
                u64* ox[FOLD_NG][8]; u64* oy[FOLD_NG][8];
                u64* oz[FOLD_NG][8];
                for (int gr = 0; gr < ng; gr++) {
                    const u64 *ax[8], *ay[8], *az[8];
                    const u64 *bx[8], *by[8], *bz[8];
                    for (int l = 0; l < 8; l++) {
                        Pt* tl = tab[gr * 8 + l];
                        ax[l] = tl[rest].X; ay[l] = tl[rest].Y;
                        az[l] = tl[rest].Z;
                        bx[l] = tl[lo].X; by[l] = tl[lo].Y;
                        bz[l] = tl[lo].Z;
                        ox[gr][l] = tl[e].X; oy[gr][l] = tl[e].Y;
                        oz[gr][l] = tl[e].Z;
                    }
                    gather8(ax, A8[gr].X, K); gather8(ay, A8[gr].Y, K);
                    gather8(az, A8[gr].Z, K);
                    gather8(bx, B8[gr].X, K); gather8(by, B8[gr].Y, K);
                    gather8(bz, B8[gr].Z, K);
                }
                for (int gr = 0; gr < ng; gr++)
                    pt_add8(fx, c.b3, A8[gr], B8[gr], A8[gr]);
                for (int gr = 0; gr < ng; gr++) {
                    scatter8(A8[gr].X, ox[gr], K);
                    scatter8(A8[gr].Y, oy[gr], K);
                    scatter8(A8[gr].Z, oz[gr], K);
                }
            }
            Pt8 ACC[FOLD_NG];
            {
                Pt id;
                pt_identity(c, id);
                const u64* px[8]; const u64* py[8]; const u64* pz[8];
                for (int l = 0; l < 8; l++) {
                    px[l] = id.X; py[l] = id.Y; pz[l] = id.Z;
                }
                gather8(px, ACC[0].X, K); gather8(py, ACC[0].Y, K);
                gather8(pz, ACC[0].Z, K);
                for (int gr = 1; gr < ng; gr++) ACC[gr] = ACC[0];
            }
            for (int bi = bits - 1; bi >= 0; bi--) {
                for (int gr = 0; gr < ng; gr++)        // shared doublings
                    pt_dbl8(fx, c.b3, ACC[gr], ACC[gr]);
                Pt8 Q[FOLD_NG];
                for (int gr = 0; gr < ng; gr++) {
                    const u64* qx[8]; const u64* qy[8]; const u64* qz[8];
                    for (int l = 0; l < 8; l++) {
                        const u64 gl = (u64)gr * 8 + l;
                        int sel = scalar_bit(ks[gl][0], 4, bi)
                                | (scalar_bit(ks[gl][1], 4, bi) << 1)
                                | (scalar_bit(ks[gl][2], 4, bi) << 2)
                                | (scalar_bit(ks[gl][3], 4, bi) << 3);
                        qx[l] = tab[gl][sel].X;
                        qy[l] = tab[gl][sel].Y;
                        qz[l] = tab[gl][sel].Z;
                    }
                    gather8(qx, Q[gr].X, K); gather8(qy, Q[gr].Y, K);
                    gather8(qz, Q[gr].Z, K);
                }
                for (int gr = 0; gr < ng; gr++)
                    pt_add8(fx, c.b3, ACC[gr], Q[gr], ACC[gr]);
            }
            for (int gr = 0; gr < ng; gr++) {
                Pt res[8];
                u64* rx[8]; u64* ry[8]; u64* rz[8];
                for (int l = 0; l < 8; l++) {
                    memset(&res[l], 0, sizeof(Pt));
                    rx[l] = res[l].X; ry[l] = res[l].Y; rz[l] = res[l].Z;
                }
                scatter8(ACC[gr].X, rx, K); scatter8(ACC[gr].Y, ry, K);
                scatter8(ACC[gr].Z, rz, K);
                for (int l = 0; l < 8; l++)
                    store_pt(c, res[l], out + (i0 + (u64)gr * 8 + l) * 3 * L);
            }
        }
    }
    if (i0 < n)                        // remainder lanes, 1-way plain
        fold_impl(c, PL + i0 * 3 * L, PR + i0 * 3 * L, s1 + i0 * Lr,
                  s2 + i0 * Lr, n - i0, out + i0 * 3 * L);
}

// 8-way 4-term fold (see fold4_impl): 16-entry joint tables, full-width
// ladder, FOLD_NG interleaved groups.
BP_TGT
static void fold4_impl8(const CurveT<Field52>& c, const u64* P1,
                        const u64* P2, const u64* P3, const u64* P4,
                        const u64* s1, const u64* s2, const u64* s3,
                        const u64* s4, u64 n, u64* out) {
    const int L = c.fp.L64, Lr = c.Lr;
    const int K = c.fp.L;
    F52x8 fx; fx.init(c.fp);
    const u64* Ss[4] = {s1, s2, s3, s4};
    u64 i0 = 0;
    for (int ng = FOLD_NG; ng >= 1; ng--) {
        const u64 lanes = (u64)ng * 8;
        for (; i0 + lanes <= n; i0 += lanes) {
            Pt tab[FOLD_NG * 8][16];
            int bits = 1;
            for (u64 l = 0; l < lanes; l++) {
                pt_identity(c, tab[l][0]);
                load_pt(c, P1 + (i0 + l) * 3 * L, tab[l][1]);
                load_pt(c, P2 + (i0 + l) * 3 * L, tab[l][2]);
                load_pt(c, P3 + (i0 + l) * 3 * L, tab[l][4]);
                load_pt(c, P4 + (i0 + l) * 3 * L, tab[l][8]);
                for (int j = 0; j < 4; j++) {
                    int b = scalar_bits(Ss[j] + (i0 + l) * Lr, Lr);
                    if (b > bits) bits = b;
                }
            }
            for (int e = 3; e < 16; e++) {     // composite entries, 8-way
                if ((e & (e - 1)) == 0) continue;
                const int lo = e & (-e), rest = e - lo;
                Pt8 A8[FOLD_NG], B8[FOLD_NG];
                u64* ox[FOLD_NG][8]; u64* oy[FOLD_NG][8];
                u64* oz[FOLD_NG][8];
                for (int gr = 0; gr < ng; gr++) {
                    const u64 *ax[8], *ay[8], *az[8];
                    const u64 *bx[8], *by[8], *bz[8];
                    for (int l = 0; l < 8; l++) {
                        Pt* tl = tab[gr * 8 + l];
                        ax[l] = tl[rest].X; ay[l] = tl[rest].Y;
                        az[l] = tl[rest].Z;
                        bx[l] = tl[lo].X; by[l] = tl[lo].Y;
                        bz[l] = tl[lo].Z;
                        ox[gr][l] = tl[e].X; oy[gr][l] = tl[e].Y;
                        oz[gr][l] = tl[e].Z;
                    }
                    gather8(ax, A8[gr].X, K); gather8(ay, A8[gr].Y, K);
                    gather8(az, A8[gr].Z, K);
                    gather8(bx, B8[gr].X, K); gather8(by, B8[gr].Y, K);
                    gather8(bz, B8[gr].Z, K);
                }
                for (int gr = 0; gr < ng; gr++)
                    pt_add8(fx, c.b3, A8[gr], B8[gr], A8[gr]);
                for (int gr = 0; gr < ng; gr++) {
                    scatter8(A8[gr].X, ox[gr], K);
                    scatter8(A8[gr].Y, oy[gr], K);
                    scatter8(A8[gr].Z, oz[gr], K);
                }
            }
            Pt8 ACC[FOLD_NG];
            {
                Pt id;
                pt_identity(c, id);
                const u64* px[8]; const u64* py[8]; const u64* pz[8];
                for (int l = 0; l < 8; l++) {
                    px[l] = id.X; py[l] = id.Y; pz[l] = id.Z;
                }
                gather8(px, ACC[0].X, K); gather8(py, ACC[0].Y, K);
                gather8(pz, ACC[0].Z, K);
                for (int gr = 1; gr < ng; gr++) ACC[gr] = ACC[0];
            }
            for (int bi = bits - 1; bi >= 0; bi--) {
                for (int gr = 0; gr < ng; gr++)
                    pt_dbl8(fx, c.b3, ACC[gr], ACC[gr]);
                Pt8 Q[FOLD_NG];
                for (int gr = 0; gr < ng; gr++) {
                    const u64* qx[8]; const u64* qy[8]; const u64* qz[8];
                    for (int l = 0; l < 8; l++) {
                        const u64 gl = (u64)(i0 + gr * 8 + l);
                        int sel = scalar_bit(Ss[0] + gl * Lr, Lr, bi)
                                | (scalar_bit(Ss[1] + gl * Lr, Lr, bi) << 1)
                                | (scalar_bit(Ss[2] + gl * Lr, Lr, bi) << 2)
                                | (scalar_bit(Ss[3] + gl * Lr, Lr, bi) << 3);
                        Pt* tl = tab[gr * 8 + l];
                        qx[l] = tl[sel].X;
                        qy[l] = tl[sel].Y;
                        qz[l] = tl[sel].Z;
                    }
                    gather8(qx, Q[gr].X, K); gather8(qy, Q[gr].Y, K);
                    gather8(qz, Q[gr].Z, K);
                }
                for (int gr = 0; gr < ng; gr++)
                    pt_add8(fx, c.b3, ACC[gr], Q[gr], ACC[gr]);
            }
            for (int gr = 0; gr < ng; gr++) {
                Pt res[8];
                u64* rx[8]; u64* ry[8]; u64* rz[8];
                for (int l = 0; l < 8; l++) {
                    memset(&res[l], 0, sizeof(Pt));
                    rx[l] = res[l].X; ry[l] = res[l].Y; rz[l] = res[l].Z;
                }
                scatter8(ACC[gr].X, rx, K); scatter8(ACC[gr].Y, ry, K);
                scatter8(ACC[gr].Z, rz, K);
                for (int l = 0; l < 8; l++)
                    store_pt(c, res[l],
                             out + (i0 + (u64)gr * 8 + l) * 3 * L);
            }
        }
    }
    if (i0 < n)                        // remainder lanes, 1-way generic
        fold4_impl(c, P1 + i0 * 3 * L, P2 + i0 * 3 * L, P3 + i0 * 3 * L,
                   P4 + i0 * 3 * L, s1 + i0 * Lr, s2 + i0 * Lr,
                   s3 + i0 * Lr, s4 + i0 * Lr, n - i0, out + i0 * 3 * L);
}

// Montgomery-form affine point with its negation's Y cached (192 bytes =
// 3 cache lines; digit sign selects Y vs nY at schedule time).
struct AffM { u64 X[MAXL], Y[MAXL], nY[MAXL]; };

BP_TGT
static void msm_combine_windows8(const CurveT<Field52>& c,
                                 const Pt* buckets, int nwin, int cbits,
                                 u64 H, u64* out);

// Signed-digit 8-way IFMA Pippenger core: buckets 1..2^(c-1) per window
// (index = |digit|, negative digits schedule (X, nY)); phase B runs the
// weighted bucket sums over a window count padded to a multiple of 8 so
// every serial chain is 8-wide.
//
// ct: constant-WORK mode for secret-scalar (witness) MSMs — the analog of
// the reference's G1Vector::inner_product_const_time
// (/root/reference/src/r1cs/prover.rs:358,423).  Zero digits are inserted
// into the discarded bucket slot 0 instead of skipped, so every point does
// exactly nwin bucket adds regardless of scalar values (the caller fixes
// nwin from the field width, not from a scan of the secret scalars).
// Operation COUNT is input-independent; bucket ADDRESSES still follow the
// digits (see AUDIT.md "Side-channel posture" for the full statement).
BP_TGT
static void msm_ifma8_signed(const CurveT<Field52>& c, const AffM* pts,
                             const int16_t* dig, u64 n_eff, int nwin,
                             int cbits, u64* out, bool ct = false) {
    F52x8 fx; fx.init(c.fp);
    const int K = c.fp.L;
    const u64 H = (u64)1 << (cbits - 1);
    const int nwin8 = (nwin + 7) & ~7;
    std::vector<Pt> buckets((u64)nwin8 * (H + 1));
    for (auto& b : buckets) pt_identity(c, b);

    Pt* qb[8]; const u64* qxp[8]; const u64* qyp[8];
    int pend = 0;
    auto flush = [&]() {
        if (pend == 8) {
            const u64* bx[8]; const u64* by[8]; const u64* bz[8];
            u64* ox[8]; u64* oy[8]; u64* oz[8];
            for (int l = 0; l < 8; l++) {
                bx[l] = qb[l]->X; by[l] = qb[l]->Y; bz[l] = qb[l]->Z;
                ox[l] = qb[l]->X; oy[l] = qb[l]->Y; oz[l] = qb[l]->Z;
            }
            Pt8 P8; Vec8 QX, QY;
            gather8(bx, P8.X, K); gather8(by, P8.Y, K);
            gather8(bz, P8.Z, K);
            gather8(qxp, QX, K); gather8(qyp, QY, K);
            pt_add_mixed8(fx, c.b3, P8, QX, QY, P8);
            scatter8(P8.X, ox, K); scatter8(P8.Y, oy, K);
            scatter8(P8.Z, oz, K);
        } else {
            for (int l = 0; l < pend; l++) {
                PtAff q;
                memcpy(q.X, qxp[l], MAXL * sizeof(u64));
                memcpy(q.Y, qyp[l], MAXL * sizeof(u64));
                pt_add_mixed(c, *qb[l], q, *qb[l]);
            }
        }
        pend = 0;
    };

    const u64 PF = 24;
    for (int w = 0; w < nwin; w++) {
        Pt* bw = buckets.data() + (u64)w * (H + 1);
        const int16_t* dw = dig + (u64)w * n_eff;
        for (u64 i = 0; i < n_eff; i++) {
            if (i + PF < n_eff) {
                int dpf = dw[i + PF];
                u64 apf = (u64)(dpf < 0 ? -dpf : dpf);
                __builtin_prefetch((const char*)(bw + apf), 1);
                __builtin_prefetch((const char*)(bw + apf) + 64, 1);
                __builtin_prefetch((const char*)(bw + apf) + 128, 1);
                __builtin_prefetch((const char*)&pts[i + PF], 0);
            }
            const int d = dw[i];
            if (!d && !ct) continue;
            // ct: digit 0 adds into slot 0, which the combine (d = H..1)
            // never reads — fixed nwin inserts per point
            Pt* slot = bw + (u64)(d < 0 ? -d : d);
            bool conflict = false;
            for (int l = 0; l < pend; l++)
                if (qb[l] == slot) { conflict = true; break; }
            if (conflict || pend == 8) flush();
            qb[pend] = slot;
            qxp[pend] = pts[i].X;
            qyp[pend] = d >= 0 ? pts[i].Y : pts[i].nY;
            pend++;
        }
        flush();
    }

    msm_combine_windows8(c, buckets.data(), nwin, cbits, H, out);
}

// phase B shared by the projective and batch-affine bucket passes:
// weighted bucket sums 8 (padded) windows side by side, then the serial
// Horner window combine.  buckets laid out nwin8 x (H+1) projective.
BP_TGT
static void msm_combine_windows8(const CurveT<Field52>& c,
                                 const Pt* buckets, int nwin, int cbits,
                                 u64 H, u64* out) {
    F52x8 fx; fx.init(c.fp);
    const int K = c.fp.L;
    const int nwin8 = (nwin + 7) & ~7;
    std::vector<Pt> totals(nwin8);
    for (int w0 = 0; w0 < nwin8; w0 += 8) {
        Pt run[8];
        for (int l = 0; l < 8; l++) pt_identity(c, run[l]);
        Pt8 RUN, SUB;
        {
            const u64* rx[8]; const u64* ry[8]; const u64* rz[8];
            for (int l = 0; l < 8; l++) {
                rx[l] = run[l].X; ry[l] = run[l].Y; rz[l] = run[l].Z;
            }
            gather8(rx, RUN.X, K); gather8(ry, RUN.Y, K);
            gather8(rz, RUN.Z, K);
            SUB = RUN;
        }
        for (u64 d = H; d >= 1; d--) {
            const u64* bx[8]; const u64* by[8]; const u64* bz[8];
            for (int l = 0; l < 8; l++) {
                const Pt& b = buckets[(u64)(w0 + l) * (H + 1) + d];
                bx[l] = b.X; by[l] = b.Y; bz[l] = b.Z;
            }
            Pt8 B8;
            gather8(bx, B8.X, K); gather8(by, B8.Y, K);
            gather8(bz, B8.Z, K);
            pt_add8(fx, c.b3, RUN, B8, RUN);
            pt_add8(fx, c.b3, SUB, RUN, SUB);
        }
        {
            u64* sx[8]; u64* sy[8]; u64* sz[8];
            for (int l = 0; l < 8; l++) {
                sx[l] = totals[w0 + l].X; sy[l] = totals[w0 + l].Y;
                sz[l] = totals[w0 + l].Z;
            }
            scatter8(SUB.X, sx, K); scatter8(SUB.Y, sy, K);
            scatter8(SUB.Z, sz, K);
        }
    }

    Pt total; pt_identity(c, total);
    for (int w = nwin - 1; w >= 0; w--) {
        for (int d2 = 0; d2 < cbits; d2++) pt_add(c, total, total, total);
        pt_add(c, total, totals[w], total);
    }
    store_pt(c, total, out);
}

// Montgomery-form modular inverse via Fermat (x^(p-2)); one per batch of
// ~BATCH affine bucket adds, so the ~2L*52-step ladder is amortized to
// ~2 muls/add.
static void f52_mont_inv(const Field52& f, const u64* one_m, const u64* x,
                         u64* out) {
    u64 e[MAXL];                                // p - 2, 52-bit limbs
    u64 borrow = 2;
    for (int j = 0; j < f.L; j++) {
        u64 s = f.mod[j] - borrow;
        borrow = (s >> 63) & 1;
        e[j] = s & M52;
    }
    int top = f.L * 52 - 1;
    while (top > 0 && !((e[top / 52] >> (top % 52)) & 1)) top--;
    u64 acc[MAXL];
    memcpy(acc, one_m, MAXL * sizeof(u64));
    for (int b = top; b >= 0; b--) {
        f.mont_mul(acc, acc, acc);
        if ((e[b / 52] >> (b % 52)) & 1) f.mont_mul(acc, x, acc);
    }
    memcpy(out, acc, MAXL * sizeof(u64));
}

// Batch-affine signed-digit bucket pass (phase A): buckets live as AFFINE
// points; each batch of up to BATCH conflict-free pending adds shares ONE
// modular inversion (Montgomery's trick), and the affine add/double
// formulas (3 muls) replace the 11-mul projective mixed adds.  Inserts
// that hit a bucket already pending in the current batch are deferred to
// the next batch (never dropped).  Produces the same group elements as the
// projective pass; gate BP_MSM_AFFINE=0 reverts.
BP_TGT
static void msm_ifma8_signed_affine(const CurveT<Field52>& c,
                                    const AffM* pts, const int16_t* dig,
                                    u64 n_eff, int nwin, int cbits,
                                    u64* out) {
    F52x8 fx; fx.init(c.fp);
    const int K = c.fp.L;
    const u64 H = (u64)1 << (cbits - 1);
    const int nwin8 = (nwin + 7) & ~7;
    const int BATCH = 256;

    std::vector<PtAff> baff(H + 1);             // per-window affine buckets
    std::vector<uint8_t> occ(H + 1), pend(H + 1);
    std::vector<Pt> buckets((u64)nwin8 * (H + 1));
    for (auto& b : buckets) pt_identity(c, b);

    // batch queue (adds into occupied buckets only)
    std::vector<uint32_t> qb(BATCH);            // bucket index
    std::vector<const u64*> qpx(BATCH), qpy(BATCH);
    std::vector<u64> den(BATCH * MAXL), pre(BATCH * MAXL);
    std::vector<u64> invden(BATCH * MAXL);
    std::vector<u64> nx(BATCH * MAXL);
    std::vector<uint8_t> kind(BATCH);           // 0 add, 1 double, 2 cancel
    std::vector<std::pair<uint32_t, uint32_t>> deferred;
    int pn = 0;

    auto flush = [&]() {
        if (!pn) return;
        const int pn8 = (pn + 7) & ~7;
        // classify (canonical Montgomery compares), then denominators and
        // numerators 8-way (common all-adds groups), 1-way fixups for the
        // rare double/cancel entries
        for (int j = 0; j < pn; j++) {
            const PtAff& B = baff[qb[j]];
            if (memcmp(B.X, qpx[j], K * sizeof(u64)) == 0)
                kind[j] = memcmp(B.Y, qpy[j], K * sizeof(u64)) == 0 ? 1 : 2;
            else
                kind[j] = 0;
        }
        for (int j = pn; j < pn8; j++) kind[j] = 3;     // padding
        for (int j0 = 0; j0 < pn; j0 += 8) {
            const int g = pn - j0 < 8 ? pn - j0 : 8;
            const u64 *bx8[8], *px8[8], *by8[8], *py8[8];
            for (int l = 0; l < g; l++) {
                const PtAff& B = baff[qb[j0 + l]];
                bx8[l] = B.X; by8[l] = B.Y;
                px8[l] = qpx[j0 + l]; py8[l] = qpy[j0 + l];
            }
            for (int l = g; l < 8; l++) {
                bx8[l] = bx8[0]; by8[l] = by8[0];
                px8[l] = px8[0]; py8[l] = py8[0];
            }
            Vec8 BX, PX, BY, PY, D8, N8;
            gather8(bx8, BX, K); gather8(px8, PX, K);
            gather8(by8, BY, K); gather8(py8, PY, K);
            fx.sub(PX, BX, D8);                 // den = x2 - x1
            fx.sub(PY, BY, N8);                 // num = y2 - y1
            u64 *dp[8], *np[8];
            for (int l = 0; l < 8; l++) {
                dp[l] = &den[(j0 + l) * MAXL];
                np[l] = &nx[(j0 + l) * MAXL];
            }
            scatter8(D8, dp, K); scatter8(N8, np, K);
            for (int l = 0; l < g; l++) {       // rare fixups
                const int j = j0 + l;
                if (kind[j] == 1) {             // double: den=2y, num=3x^2
                    const PtAff& B = baff[qb[j]];
                    c.fp.add(B.Y, B.Y, &den[j * MAXL]);
                    u64 xx[MAXL], xx2[MAXL];
                    c.fp.mont_mul(B.X, B.X, xx);
                    c.fp.add(xx, xx, xx2);
                    c.fp.add(xx2, xx, &nx[j * MAXL]);
                } else if (kind[j] == 2) {      // cancel: placeholder 1
                    memcpy(&den[j * MAXL], c.one_m, MAXL * sizeof(u64));
                    memcpy(&nx[j * MAXL], c.one_m, MAXL * sizeof(u64));
                }
            }
        }
        for (int j = pn; j < pn8; j++)          // multiplicative padding
            memcpy(&den[j * MAXL], c.one_m, MAXL * sizeof(u64));
        // batch inversion over 8 INTERLEAVED prefix chains (chain l covers
        // j = l, l+8, ...), so the serial mont_mul chains run 8-wide; the
        // 8 chain tails share one Fermat inversion
        {
            const u64 *s8[8];
            u64 *d8[8];
            Vec8 PRE, D8;
            for (int l = 0; l < 8; l++) s8[l] = &den[l * MAXL];
            gather8(s8, PRE, K);
            for (int l = 0; l < 8; l++) d8[l] = &pre[l * MAXL];
            scatter8(PRE, d8, K);
            for (int j0 = 8; j0 < pn8; j0 += 8) {
                for (int l = 0; l < 8; l++) s8[l] = &den[(j0 + l) * MAXL];
                gather8(s8, D8, K);
                fx.mont_mul(PRE, D8, PRE);
                for (int l = 0; l < 8; l++) d8[l] = &pre[(j0 + l) * MAXL];
                scatter8(PRE, d8, K);
            }
            // tails: T_l = pre[last group, lane l]; batch-invert the 8
            u64 tpre[8][MAXL], cinv[8][MAXL], inv[MAXL];
            const int lastg = pn8 - 8;
            memcpy(tpre[0], &pre[lastg * MAXL], MAXL * sizeof(u64));
            for (int l = 1; l < 8; l++)
                c.fp.mont_mul(tpre[l - 1], &pre[(lastg + l) * MAXL],
                              tpre[l]);
            f52_mont_inv(c.fp, c.one_m, tpre[7], inv);
            for (int l = 7; l >= 1; l--) {
                c.fp.mont_mul(inv, tpre[l - 1], cinv[l]);
                c.fp.mont_mul(inv, &pre[(lastg + l) * MAXL], inv);
            }
            memcpy(cinv[0], inv, MAXL * sizeof(u64));
            // backout, 8-way down the chains:
            // invden[j] = run_l * pre[j-8]; run_l *= den[j]
            Vec8 RUN;
            {
                const u64* c8[8];
                for (int l = 0; l < 8; l++) c8[l] = cinv[l];
                gather8(c8, RUN, K);
            }
            for (int j0 = pn8 - 8; j0 >= 8; j0 -= 8) {
                const u64 *p8[8];
                u64 *o8[8];
                Vec8 P8v, D8v, IV;
                for (int l = 0; l < 8; l++)
                    p8[l] = &pre[(j0 - 8 + l) * MAXL];
                gather8(p8, P8v, K);
                fx.mont_mul(RUN, P8v, IV);
                for (int l = 0; l < 8; l++) o8[l] = &invden[(j0 + l) * MAXL];
                scatter8(IV, o8, K);
                for (int l = 0; l < 8; l++) s8[l] = &den[(j0 + l) * MAXL];
                gather8(s8, D8v, K);
                fx.mont_mul(RUN, D8v, RUN);
            }
            {
                u64 *o8[8];
                for (int l = 0; l < 8; l++) o8[l] = &invden[l * MAXL];
                scatter8(RUN, o8, K);
            }
        }
        // lambda + writeback, 8-way groups
        for (int j0 = 0; j0 < pn; j0 += 8) {
            const int g = pn - j0 < 8 ? pn - j0 : 8;
            const u64 *a8[8], *b8[8];
            for (int l = 0; l < g; l++) {
                a8[l] = &nx[(j0 + l) * MAXL];
                b8[l] = &invden[(j0 + l) * MAXL];
            }
            for (int l = g; l < 8; l++) { a8[l] = a8[0]; b8[l] = b8[0]; }
            Vec8 N8, D8, L8, L2, BX, PX, BY, X3, Y3, T;
            gather8(a8, N8, K); gather8(b8, D8, K);
            fx.mont_mul(N8, D8, L8);            // lambda
            const u64 *bx8[8], *px8[8], *by8[8];
            for (int l = 0; l < g; l++) {
                bx8[l] = baff[qb[j0 + l]].X;
                px8[l] = kind[j0 + l] == 1 ? baff[qb[j0 + l]].X
                                           : qpx[j0 + l];
                by8[l] = baff[qb[j0 + l]].Y;
            }
            for (int l = g; l < 8; l++) {
                bx8[l] = bx8[0]; px8[l] = px8[0]; by8[l] = by8[0];
            }
            gather8(bx8, BX, K); gather8(px8, PX, K); gather8(by8, BY, K);
            fx.mont_mul(L8, L8, L2);            // lambda^2
            fx.sub(L2, BX, X3); fx.sub(X3, PX, X3);
            fx.sub(BX, X3, T);
            fx.mont_mul(L8, T, Y3);
            fx.sub(Y3, BY, Y3);
            u64 ox[8][MAXL], oy[8][MAXL];
            u64 *oxp[8], *oyp[8];
            for (int l = 0; l < 8; l++) { oxp[l] = ox[l]; oyp[l] = oy[l]; }
            scatter8(X3, oxp, K); scatter8(Y3, oyp, K);
            for (int l = 0; l < g; l++) {
                PtAff& B = baff[qb[j0 + l]];
                if (kind[j0 + l] == 2) {
                    occ[qb[j0 + l]] = 0;        // cancelled to identity
                } else {
                    memcpy(B.X, ox[l], MAXL * sizeof(u64));
                    memcpy(B.Y, oy[l], MAXL * sizeof(u64));
                }
            }
        }
        for (int j = 0; j < pn; j++) pend[qb[j]] = 0;
        pn = 0;
    };

    auto insert = [&](uint32_t bidx, const u64* px, const u64* py) {
        if (!occ[bidx] && !pend[bidx]) {
            PtAff& B = baff[bidx];
            memcpy(B.X, px, MAXL * sizeof(u64));
            memcpy(B.Y, py, MAXL * sizeof(u64));
            occ[bidx] = 1;
            return true;
        }
        if (pend[bidx]) return false;           // defer
        pend[bidx] = 1;
        qb[pn] = bidx; qpx[pn] = px; qpy[pn] = py;
        if (++pn == BATCH) flush();
        return true;
    };

    const u64 PF = 24;
    for (int w = 0; w < nwin; w++) {
        memset(occ.data(), 0, occ.size());
        memset(pend.data(), 0, pend.size());
        deferred.clear();
        pn = 0;
        const int16_t* dw = dig + (u64)w * n_eff;
        for (u64 i = 0; i < n_eff; i++) {
            if (i + PF < n_eff) {
                int dpf = dw[i + PF];
                u64 apf = (u64)(dpf < 0 ? -dpf : dpf);
                __builtin_prefetch((const char*)(baff.data() + apf), 1);
                __builtin_prefetch((const char*)&pts[i + PF], 0);
            }
            const int d = dw[i];
            if (!d) continue;
            const uint32_t bidx = (uint32_t)(d < 0 ? -d : d);
            const u64* px = pts[i].X;
            const u64* py = d > 0 ? pts[i].Y : pts[i].nY;
            if (!insert(bidx, px, py))
                deferred.emplace_back(bidx, (uint32_t)(2 * i + (d < 0)));
        }
        // drain deferred inserts (each flush clears the pending flags)
        while (!deferred.empty()) {
            flush();
            std::vector<std::pair<uint32_t, uint32_t>> still;
            for (auto& e : deferred) {
                u64 i = e.second >> 1;
                const u64* py = (e.second & 1) ? pts[i].nY : pts[i].Y;
                if (!insert(e.first, pts[i].X, py)) still.push_back(e);
            }
            deferred.swap(still);
        }
        flush();
        // export affine buckets to the projective grid for phase B
        Pt* bw = buckets.data() + (u64)w * (H + 1);
        for (u64 d2 = 1; d2 <= H; d2++) {
            if (!occ[d2]) continue;
            memcpy(bw[d2].X, baff[d2].X, MAXL * sizeof(u64));
            memcpy(bw[d2].Y, baff[d2].Y, MAXL * sizeof(u64));
            memcpy(bw[d2].Z, c.one_m, MAXL * sizeof(u64));
        }
    }

    msm_combine_windows8(c, buckets.data(), nwin, cbits, H, out);
}

// IFMA driver: normalize, build (X, Y, p-Y) [+ GLV psi half], split +
// recode scalars, run the signed core.  k scalar SETS (stride n*Lr) share
// the normalization/psi prep — the expensive per-point work — and produce
// k outputs (stride 3*L64): the prover's phase-1 witness commitments are
// three MSMs over one [G | H | h] table.
BP_TGT
static void msm2_ifma(const CurveT<Field52>& c, const GlvCtx& g,
                      const u64* pts_proj, const u64* scalars, u64 n,
                      u64 k, u64* out, bool ct = false) {
    const int Lr = c.Lr;
    const int L64 = c.fp.L64;
    std::vector<char> isid;
    std::vector<u64> AX(n * MAXL), AY(n * MAXL);
    normalize_points(c, pts_proj, n, AX.data(), AY.data(), isid);

    // ct (constant-work witness mode): full-width window count from the
    // limb width (no scan of the secret scalars), no GLV split (its output
    // magnitudes would need a scan-free bound), no zero-digit skips in the
    // core, no maxbits early-out.  Identity POINTS still recode to all-zero
    // digits — point structure is public (generators), only scalars are
    // secret.
    const bool glv = g.enabled && !ct;
    const u64 n_eff = glv ? 2 * n : n;
    std::vector<AffM> pts(n_eff);
    u64 zero[MAXL] = {0};
    for (u64 i = 0; i < n; i++) {
        memcpy(pts[i].X, &AX[i * MAXL], MAXL * sizeof(u64));
        memcpy(pts[i].Y, &AY[i * MAXL], MAXL * sizeof(u64));
        c.fp.sub(zero, pts[i].Y, pts[i].nY);
        if (glv) {
            c.fp.mont_mul(pts[i].X, g.beta_m, pts[n + i].X);
            memcpy(pts[n + i].Y, pts[i].Y, MAXL * sizeof(u64));
            memcpy(pts[n + i].nY, pts[i].nY, MAXL * sizeof(u64));
        }
    }

    std::vector<u64> S(glv ? 2 * n * 4 : 0);
    std::vector<int16_t> dig;
    for (u64 set = 0; set < k; set++) {
        const u64* sc = scalars + set * n * Lr;
        u64* out_set = out + set * 3 * L64;
        int maxbits = ct ? Lr * 64 : 0;
        for (u64 i = 0; !ct && i < n; i++) {
            if (isid[i]) {
                if (glv) {
                    memset(&S[i * 4], 0, 4 * sizeof(u64));
                    memset(&S[(n + i) * 4], 0, 4 * sizeof(u64));
                }
                continue;
            }
            if (glv) {
                glv_split(g, sc + i * Lr, Lr, &S[i * 4], &S[(n + i) * 4]);
                int b1 = scalar_bits(&S[i * 4], 4);
                int b2 = scalar_bits(&S[(n + i) * 4], 4);
                if (b1 > maxbits) maxbits = b1;
                if (b2 > maxbits) maxbits = b2;
            } else {
                int b = scalar_bits(sc + i * Lr, Lr);
                if (b > maxbits) maxbits = b;
            }
        }
        if (maxbits == 0) {
            Pt id; pt_identity(c, id);
            store_pt(c, id, out_set);
            continue;
        }

        // swept on this host with the signed+GLV core (NOTES.md round 3:
        // n=64 c=8 3.7ms, n=256 c=9 7.6, n=2048 c=10 30, n=16384 c=11 194,
        // n=65536 c=13 ~762 vs c=12 ~800)
        int cbits;
        if (n < 256) cbits = 8;
        else if (n < 1024) cbits = 9;
        else if (n < 8192) cbits = 10;
        else if (n < 32768) cbits = 11;
        else cbits = 13;
        const char* ov = getenv("BP_CPP_WINDOW");
        if (ov && ov[0]) {
            int v = atoi(ov);
            if (v >= 2 && v <= 14) cbits = v;
        }

        const int nwin = (maxbits + cbits) / cbits;  // +1 bit: signed carry
        dig.assign((u64)nwin * n_eff, 0);
        for (u64 i = 0; i < n_eff; i++) {
            if (isid[i % n]) continue;
            const u64* kk = glv ? &S[i * 4] : sc + i * Lr;
            recode_signed(kk, glv ? 4 : Lr, cbits, nwin, dig.data(),
                          n_eff, i);
        }
        // BP_MSM_AFFINE=1 opts into the batch-affine bucket pass —
        // measured SLOWER than the projective mixed-add pass on this host
        // (0.67 vs 0.47 s at n=16384): the 6-vs-11 mul advantage is eaten
        // by the extra gather/scatter round-trips between the den/prefix/
        // backout/writeback passes, while pt_add_mixed8 keeps everything
        // in zmm registers.  Kept (bit-exact) for future A/B.
        const char* aff = getenv("BP_MSM_AFFINE");
        if (aff && aff[0] == '1' && !ct)   // ct forces the projective core
            msm_ifma8_signed_affine(c, pts.data(), dig.data(), n_eff, nwin,
                                    cbits, out_set);
        else
            msm_ifma8_signed(c, pts.data(), dig.data(), n_eff, nwin, cbits,
                             out_set, ct);
    }
}

#endif  // __x86_64__

// Portable / general-a fallback: normalize in-native, then the classic
// unsigned core (msm_impl) on the affine buffer.
template <class F>
static void msm2_generic(const CurveT<F>& c, const u64* pts_proj,
                         const u64* scalars, u64 n, u64* out,
                         bool ct = false) {
    const int L = c.fp.L64, Lr = c.Lr;
    std::vector<char> isid;
    std::vector<u64> AX(n * MAXL), AY(n * MAXL);
    normalize_points(c, pts_proj, n, AX.data(), AY.data(), isid);
    std::vector<u64> aff(n * 2 * L), ks(n * Lr);
    memcpy(ks.data(), scalars, n * Lr * sizeof(u64));
    for (u64 i = 0; i < n; i++) {
        if (isid[i]) {
            memset(&ks[i * Lr], 0, Lr * sizeof(u64));
            memset(&aff[i * 2 * L], 0, 2 * L * sizeof(u64));
            continue;
        }
        c.fp.mont_to_abi(&AX[i * MAXL], &aff[i * 2 * L]);
        c.fp.mont_to_abi(&AY[i * MAXL], &aff[i * 2 * L + L]);
    }
    msm_impl(c, aff.data(), ks.data(), n, out, ct);
}

// Scalar-field (mod r) Montgomery context for the native IPA round loop.
// rparams: [Lr, n0inv_r, rmod[8], rr2[8]] = 18 u64 (built in cpp_backend).
static Field load_rfield(const u64* p) {
    Field f;
    memset(&f, 0, sizeof(f));
    f.L = (int)p[0];
    f.L64 = f.L;
    f.n0inv = p[1];
    memcpy(f.mod, p + 2, 8 * sizeof(u64));
    memcpy(f.r2, p + 10, 8 * sizeof(u64));
    return f;
}

// ---- keccak-f[1600] (merlin/STROBE transcript permutation) ----
// The transcript layer runs a few dozen permutations per proof; the pure
// Python loop costs ~0.8 ms each, this ~0.4 us.  Standard implementation
// from the FIPS-202 spec (replaces merlin's `keccak` crate dependency).

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static inline u64 rotl64(u64 x, int n) {
    return n ? (x << n) | (x >> (64 - n)) : x;
}

extern "C" {

// In-place permutation of the 25-lane (200-byte little-endian) state.
void bp_keccak_f1600(u64* A) {
    // rotation offsets indexed by lane x + 5y (matches _ROTC[x][y])
    static const int rotc[25] = {
        0, 1, 62, 28, 27,
        36, 44, 6, 55, 20,
        3, 10, 43, 25, 39,
        41, 45, 15, 21, 8,
        18, 2, 61, 56, 14,
    };
    u64 B[25], C[5], D[5];
    for (int round = 0; round < 24; round++) {
        for (int x = 0; x < 5; x++)
            C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
        for (int x = 0; x < 5; x++)
            D[x] = C[(x + 4) % 5] ^ rotl64(C[(x + 1) % 5], 1);
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                A[x + 5 * y] ^= D[x];
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                B[y + 5 * ((2 * x + 3 * y) % 5)] =
                    rotl64(A[x + 5 * y], rotc[y * 5 + x]);
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++)
                A[x + 5 * y] = B[x + 5 * y] ^
                    ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y]);
        A[0] ^= KECCAK_RC[round];
    }
}

void bp_msm(const u64* params, const u64* points, const u64* scalars,
            u64 n, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
#if defined(__x86_64__)
        if (!c.a_nonzero) {
            msm_ifma8(c52, points, scalars, n, out);
            return;
        }
#endif
        msm_impl(c52, points, scalars, n, out);
    } else {
        msm_impl(c, points, scalars, n, out);
    }
}

// Projective-input MSM (see header above bp_msm2's helpers).  glv_params:
// [enabled, lam[4], mu[5], beta_plain[8]] (18 u64; all-zero disables GLV).
// k independent MSMs over ONE point table (scalars: k sets of n, stride
// n*Lr; out: k points).  The IFMA path shares the point normalization +
// GLV psi prep across sets; fallbacks loop.
static void msm2_multi_impl(const u64* params, const u64* glv_params,
                            const u64* points, const u64* scalars, u64 n,
                            u64 k, u64* out, bool ct) {
    CurveT<Field> c = load_curve(params);
    const int L64 = c.fp.L64;
    const int Lr = (int)c.Lr;
    if (n == 0) {
        Pt id; pt_identity(c, id);
        for (u64 s = 0; s < k; s++) store_pt(c, id, out + s * 3 * L64);
        return;
    }
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
#if defined(__x86_64__)
        if (!c.a_nonzero) {
            GlvCtx g;
            memset(&g, 0, sizeof(g));
            g.enabled = glv_params && glv_params[0] != 0;
            if (g.enabled) {
                memcpy(g.lam, glv_params + 1, 4 * sizeof(u64));
                memcpy(g.mu, glv_params + 5, 5 * sizeof(u64));
                c52.fp.abi_to_mont(glv_params + 10, g.beta_m);
            }
            msm2_ifma(c52, g, points, scalars, n, k, out, ct);
            return;
        }
        for (u64 s = 0; s < k; s++)
            msm2_generic(c52, points, scalars + s * n * Lr, n,
                         out + s * 3 * L64, ct);
        return;
#endif
    }
    for (u64 s = 0; s < k; s++)
        msm2_generic(c, points, scalars + s * n * Lr, n, out + s * 3 * L64,
                     ct);
}

void bp_msm2_multi(const u64* params, const u64* glv_params,
                   const u64* points, const u64* scalars, u64 n, u64 k,
                   u64* out) {
    msm2_multi_impl(params, glv_params, points, scalars, n, k, out, false);
}

// Constant-WORK variant for secret-scalar (witness) MSMs: fixed full-width
// window count, no zero-digit skips, no GLV split, no maxbits scan — the
// operation count is independent of the scalar values.  Replaces the
// reference's G1Vector::inner_product_const_time witness commitments
// (/root/reference/src/r1cs/prover.rs:358,423).  Same group elements
// bit-for-bit as bp_msm2_multi.
void bp_msm2_multi_ct(const u64* params, const u64* glv_params,
                      const u64* points, const u64* scalars, u64 n, u64 k,
                      u64* out) {
    msm2_multi_impl(params, glv_params, points, scalars, n, k, out, true);
}

void bp_msm2(const u64* params, const u64* glv_params, const u64* points,
             const u64* scalars, u64 n, u64* out) {
    msm2_multi_impl(params, glv_params, points, scalars, n, 1, out, false);
}

void bp_msm2_ct(const u64* params, const u64* glv_params, const u64* points,
                const u64* scalars, u64 n, u64* out) {
    msm2_multi_impl(params, glv_params, points, scalars, n, 1, out, true);
}

void bp_fold(const u64* params, const u64* PL, const u64* PR,
             const u64* s1, const u64* s2, u64 n, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
#if defined(__x86_64__)
        if (!c.a_nonzero) {
            fold_impl8(c52, PL, PR, s1, s2, n, out);
            return;
        }
#endif
        fold_impl(c52, PL, PR, s1, s2, n, out);
    } else {
        fold_impl(c, PL, PR, s1, s2, n, out);
    }
}

// GLV-aware fold: glv_params as in bp_msm2 ([enabled, lam[4], mu[5],
// beta_plain[8]]; all-zero disables the endomorphism path).
void bp_fold2(const u64* params, const u64* glv_params, const u64* PL,
              const u64* PR, const u64* s1, const u64* s2, u64 n,
              u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
#if defined(__x86_64__)
        if (!c.a_nonzero) {
            if (glv_params && glv_params[0] != 0) {
                GlvCtx g;
                memset(&g, 0, sizeof(g));
                g.enabled = true;
                memcpy(g.lam, glv_params + 1, 4 * sizeof(u64));
                memcpy(g.mu, glv_params + 5, 5 * sizeof(u64));
                c52.fp.abi_to_mont(glv_params + 10, g.beta_m);
                fold_impl8_glv(c52, g, PL, PR, s1, s2, n, out);
            } else {
                fold_impl8(c52, PL, PR, s1, s2, n, out);
            }
            return;
        }
#endif
        fold_impl(c52, PL, PR, s1, s2, n, out);
    } else {
        fold_impl(c, PL, PR, s1, s2, n, out);
    }
}

// ---------------------------------------------------------------------------
// Native-resident IPA round loop (`/root/reference/src/ipp.rs:66-194`).
// The round state (G, H bases as ABI point buffers; a, b as plain LE scalar
// limbs) stays in caller-owned numpy buffers across rounds — no Python<->
// native marshalling per round, only the two L/R points cross for the
// Fiat-Shamir transcript.  Scalar arithmetic runs in a mod-r Montgomery
// context: with one operand pre-converted (x*R), mont_mul(x*R, y) = x*y
// plain — so plain-form vectors fold with one multiply per product.
// ---------------------------------------------------------------------------

// Phase A: c_L/c_R inner products + the two (n/2*2+1)-point L/R MSMs.
// gfac/hfac non-null on the first round (per-element basis factors,
// ipp.rs:68-136).  outLR receives L then R (2 ABI points).
void bp_ipp_round_lr(const u64* params, const u64* rparams, const u64* glv,
                     const u64* G, const u64* H, const u64* a, const u64* b,
                     const u64* gfac, const u64* hfac, const u64* Q,
                     u64 n, u64* outLR) {
    CurveT<Field> c = load_curve(params);
    Field fr = load_rfield(rparams);
    const int L = c.fp.L64, Lr = fr.L;
    const u64 n2 = n / 2;
    u64 cl[MAXL] = {0}, cr[MAXL] = {0}, tm[MAXL], tp[MAXL];
    for (u64 i = 0; i < n2; i++) {
        fr.mont_mul(b + (n2 + i) * Lr, fr.r2, tm);       // b_R -> mont
        fr.mont_mul(tm, a + i * Lr, tp);                 // a_L*b_R plain
        fr.add(cl, tp, cl);
        fr.mont_mul(b + i * Lr, fr.r2, tm);              // b_L -> mont
        fr.mont_mul(tm, a + (n2 + i) * Lr, tp);          // a_R*b_L plain
        fr.add(cr, tp, cr);
    }
    std::vector<u64> pts((n + 1) * 3 * L);
    std::vector<u64> sc((n + 1) * Lr, 0);
    // L = <a_L(*GfR), G_R> + <b_R(*HfL), H_L> + c_L*Q
    memcpy(pts.data(), G + n2 * 3 * L, n2 * 3 * L * sizeof(u64));
    memcpy(pts.data() + n2 * 3 * L, H, n2 * 3 * L * sizeof(u64));
    memcpy(pts.data() + (u64)n * 3 * L, Q, 3 * L * sizeof(u64));
    for (u64 i = 0; i < n2; i++) {
        if (gfac) {
            fr.mont_mul(gfac + (n2 + i) * Lr, fr.r2, tm);
            fr.mont_mul(tm, a + i * Lr, sc.data() + i * Lr);
            fr.mont_mul(hfac + i * Lr, fr.r2, tm);
            fr.mont_mul(tm, b + (n2 + i) * Lr, sc.data() + (n2 + i) * Lr);
        } else {
            memcpy(sc.data() + i * Lr, a + i * Lr, Lr * sizeof(u64));
            memcpy(sc.data() + (n2 + i) * Lr, b + (n2 + i) * Lr,
                   Lr * sizeof(u64));
        }
    }
    memcpy(sc.data() + (u64)n * Lr, cl, Lr * sizeof(u64));
    bp_msm2(params, glv, pts.data(), sc.data(), n + 1, outLR);
    // R = <a_R(*GfL), G_L> + <b_L(*HfR), H_R> + c_R*Q
    memcpy(pts.data(), G, n2 * 3 * L * sizeof(u64));
    memcpy(pts.data() + n2 * 3 * L, H + n2 * 3 * L, n2 * 3 * L * sizeof(u64));
    for (u64 i = 0; i < n2; i++) {
        if (gfac) {
            fr.mont_mul(gfac + i * Lr, fr.r2, tm);
            fr.mont_mul(tm, a + (n2 + i) * Lr, sc.data() + i * Lr);
            fr.mont_mul(hfac + (n2 + i) * Lr, fr.r2, tm);
            fr.mont_mul(tm, b + i * Lr, sc.data() + (n2 + i) * Lr);
        } else {
            memcpy(sc.data() + i * Lr, a + (n2 + i) * Lr, Lr * sizeof(u64));
            memcpy(sc.data() + (n2 + i) * Lr, b + i * Lr, Lr * sizeof(u64));
        }
    }
    memcpy(sc.data() + (u64)n * Lr, cr, Lr * sizeof(u64));
    bp_msm2(params, glv, pts.data(), sc.data(), n + 1, outLR + 3 * L);
}

// Phase B: fold a, b (scalar halves) and G, H (base halves) in place after
// the challenge u; the front halves of all four buffers hold the new round
// state.  gfac/hfac non-null on the first round.  G == NULL skips the base
// folds (the paired-round scheme defers them to one 4-term fold).
void bp_ipp_round_fold(const u64* params, const u64* rparams, const u64* glv,
                       u64* G, u64* H, u64* a, u64* b, const u64* gfac,
                       const u64* hfac, const u64* u, const u64* u_inv,
                       u64 n) {
    CurveT<Field> c = load_curve(params);
    Field fr = load_rfield(rparams);
    const int L = c.fp.L64, Lr = fr.L;
    const u64 n2 = n / 2;
    u64 um[MAXL], uim[MAXL], t1[MAXL], t2[MAXL], tm[MAXL];
    fr.mont_mul(u, fr.r2, um);
    fr.mont_mul(u_inv, fr.r2, uim);
    // a' = u*a_L + u_inv*a_R ; b' = u_inv*b_L + u*b_R   (ipp.rs:115-118)
    for (u64 i = 0; i < n2; i++) {
        fr.mont_mul(um, a + i * Lr, t1);
        fr.mont_mul(uim, a + (n2 + i) * Lr, t2);
        fr.add(t1, t2, a + i * Lr);
        fr.mont_mul(uim, b + i * Lr, t1);
        fr.mont_mul(um, b + (n2 + i) * Lr, t2);
        fr.add(t1, t2, b + i * Lr);
    }
    if (!G) return;
    // G' = (u_inv*GfL_i)*G_L + (u*GfR_i)*G_R ; H' mirrored (ipp.rs:119-130)
    std::vector<u64> s1(n2 * Lr), s2(n2 * Lr);
    if (gfac) {
        for (u64 i = 0; i < n2; i++) {
            fr.mont_mul(gfac + i * Lr, fr.r2, tm);
            fr.mont_mul(tm, u_inv, s1.data() + i * Lr);
            fr.mont_mul(gfac + (n2 + i) * Lr, fr.r2, tm);
            fr.mont_mul(tm, u, s2.data() + i * Lr);
        }
    } else {
        for (u64 i = 0; i < n2; i++) {
            memcpy(s1.data() + i * Lr, u_inv, Lr * sizeof(u64));
            memcpy(s2.data() + i * Lr, u, Lr * sizeof(u64));
        }
    }
    bp_fold2(params, glv, G, G + n2 * 3 * L, s1.data(), s2.data(), n2, G);
    if (gfac) {
        for (u64 i = 0; i < n2; i++) {
            fr.mont_mul(hfac + i * Lr, fr.r2, tm);
            fr.mont_mul(tm, u, s1.data() + i * Lr);
            fr.mont_mul(hfac + (n2 + i) * Lr, fr.r2, tm);
            fr.mont_mul(tm, u_inv, s2.data() + i * Lr);
        }
    } else {
        for (u64 i = 0; i < n2; i++) {
            memcpy(s1.data() + i * Lr, u, Lr * sizeof(u64));
            memcpy(s2.data() + i * Lr, u_inv, Lr * sizeof(u64));
        }
    }
    bp_fold2(params, glv, H, H + n2 * 3 * L, s1.data(), s2.data(), n2, H);
}

// ---------------------------------------------------------------------------
// l(x)/r(x)/t-poly stage of Prover::prove (`prover.rs:458-513`,
// `vector_poly.rs:79-97`): the O(n) vector-poly coefficient build and the
// special inner product <l(x), r(x)> run in one native pass, replacing
// ~100 ms of per-element Python Scalar objects at n = 2048.  Split in two
// because the protocol draws challenge x only AFTER the T_i commitments:
// pass T computes t1..t6 and stashes the per-element coefficients
// (l1, r0, r1, r3) in a caller-owned scratch buffer; pass EVAL evaluates
// l(x), r(x) from the scratch (plus l2 = a_O, l3 = s_L) straight into the
// plain-limb buffers the native IPA loop consumes.
// ---------------------------------------------------------------------------

// scratch layout: n * 4 * Lr (per element: l1, r0, r1, r3) + Lr (y^n plain)
// all vector args are n plain LE Lr-limb scalars; t_out = 6 * Lr (t1..t6)
void bp_prove_polys_t(const u64* rparams, const u64* aL, const u64* aR,
                      const u64* aO, const u64* sL, const u64* sR,
                      const u64* wL, const u64* wR, const u64* wO,
                      const u64* y, const u64* y_inv, u64 n,
                      u64* t_out, u64* scratch) {
    Field fr = load_rfield(rparams);
    const int Lr = fr.L;
    u64 y_m[MAXL], yinv_m[MAXL];
    fr.abi_to_mont(y, y_m);
    fr.abi_to_mont(y_inv, yinv_m);
    u64 one_m[MAXL];
    { u64 onep[MAXL] = {0}; onep[0] = 1; fr.abi_to_mont(onep, one_m); }
    u64 yp_m[MAXL], yp_plain[MAXL] = {0}, yi_m[MAXL];
    memcpy(yp_m, one_m, MAXL * sizeof(u64));      // y^i Montgomery
    yp_plain[0] = 1;                              // y^i plain
    memcpy(yi_m, one_m, MAXL * sizeof(u64));      // y^-i Montgomery
    u64 t[6][MAXL];
    memset(t, 0, sizeof(t));
    u64 u[MAXL], p[MAXL], l1m[MAXL], l2m[MAXL], l3m[MAXL];
    for (u64 i = 0; i < n; i++) {
        u64* row = scratch + i * 4 * Lr;
        u64 *l1 = row, *r0 = row + Lr, *r1 = row + 2 * Lr,
            *r3 = row + 3 * Lr;
        fr.mont_mul(yi_m, wR + i * Lr, u);        // y^-i * wR_i (plain)
        fr.add(aL + i * Lr, u, l1);               // l1 = aL + y^-i wR
        fr.sub(wO + i * Lr, yp_plain, r0);        // r0 = wO - y^i
        fr.mont_mul(yp_m, aR + i * Lr, u);
        fr.add(u, wL + i * Lr, r1);               // r1 = y^i aR + wL
        fr.mont_mul(yp_m, sR + i * Lr, r3);       // r3 = y^i sR
        // t-poly accumulation (l2 = aO_i, l3 = sL_i)
        fr.abi_to_mont(l1, l1m);
        fr.abi_to_mont(aO + i * Lr, l2m);
        fr.abi_to_mont(sL + i * Lr, l3m);
        fr.mont_mul(l1m, r0, p); fr.add(t[0], p, t[0]);   // t1 += l1*r0
        fr.mont_mul(l1m, r1, p); fr.add(t[1], p, t[1]);   // t2 += l1*r1
        fr.mont_mul(l2m, r0, p); fr.add(t[1], p, t[1]);   //    += l2*r0
        fr.mont_mul(l2m, r1, p); fr.add(t[2], p, t[2]);   // t3 += l2*r1
        fr.mont_mul(l3m, r0, p); fr.add(t[2], p, t[2]);   //    += l3*r0
        fr.mont_mul(l1m, r3, p); fr.add(t[3], p, t[3]);   // t4 += l1*r3
        fr.mont_mul(l3m, r1, p); fr.add(t[3], p, t[3]);   //    += l3*r1
        fr.mont_mul(l2m, r3, p); fr.add(t[4], p, t[4]);   // t5 += l2*r3
        fr.mont_mul(l3m, r3, p); fr.add(t[5], p, t[5]);   // t6 += l3*r3
        // advance the y chains
        fr.mont_mul(yp_m, y_m, yp_m);
        fr.mont_mul(y_m, yp_plain, yp_plain);
        fr.mont_mul(yi_m, yinv_m, yi_m);
    }
    memcpy(scratch + (u64)n * 4 * Lr, yp_plain, Lr * sizeof(u64));
    for (int k = 0; k < 6; k++)
        memcpy(t_out + (u64)k * Lr, t[k], Lr * sizeof(u64));
}

// l_out[i] = x*(l1 + x*(l2 + x*l3));  r_out[i] = r0 + x*r1 + x^3*r3;
// padding rows i in [n, padded_n): l = 0, r = -y^i (prover.rs:530-535).
// Outputs are plain-limb (padded_n * Lr) buffers — the a/b inputs of
// bp_ipp_round_lr/_fold, no Python marshalling in between.
void bp_prove_polys_eval(const u64* rparams, const u64* scratch,
                         const u64* aO, const u64* sL, const u64* x,
                         const u64* y, u64 n, u64 padded_n,
                         u64* l_out, u64* r_out) {
    Field fr = load_rfield(rparams);
    const int Lr = fr.L;
    u64 x_m[MAXL], x3_m[MAXL], y_m[MAXL];
    fr.abi_to_mont(x, x_m);
    fr.mont_mul(x_m, x_m, x3_m);                  // x^2 (Montgomery)
    fr.mont_mul(x3_m, x_m, x3_m);                 // x^3 (Montgomery)
    fr.abi_to_mont(y, y_m);
    u64 e[MAXL], f[MAXL], f2[MAXL];
    for (u64 i = 0; i < n; i++) {
        const u64* row = scratch + i * 4 * Lr;
        const u64 *l1 = row, *r0 = row + Lr, *r1 = row + 2 * Lr,
                  *r3 = row + 3 * Lr;
        fr.mont_mul(x_m, sL + i * Lr, e);         // x*l3 (plain)
        fr.add(e, aO + i * Lr, e);                // + l2
        fr.mont_mul(x_m, e, e);
        fr.add(e, l1, e);                         // + l1
        fr.mont_mul(x_m, e, l_out + i * Lr);      // * x
        fr.mont_mul(x_m, r1, f);                  // x*r1
        fr.mont_mul(x3_m, r3, f2);                // x^3*r3
        fr.add(f, f2, f);
        fr.add(f, r0, r_out + i * Lr);
    }
    u64 yp_plain[MAXL], zero[MAXL] = {0};
    memcpy(yp_plain, scratch + (u64)n * 4 * Lr, Lr * sizeof(u64));
    for (u64 i = n; i < padded_n; i++) {
        memset(l_out + i * Lr, 0, Lr * sizeof(u64));
        fr.sub(zero, yp_plain, r_out + i * Lr);   // -y^i
        fr.mont_mul(y_m, yp_plain, yp_plain);
    }
}

// IPA verification s-vector (`ipp.rs:262-315`): s[0] = prod_inv,
// s[i] = s[i - 2^floor(lg i)] * u_sq[lg_n - 1 - floor(lg i)].
// u_sq: lg_n plain scalars; prod_inv: plain; s_out: n plain scalars.
void bp_ipa_svector(const u64* rparams, const u64* u_sq,
                    const u64* prod_inv, u64 lg_n, u64 n, u64* s_out) {
    Field fr = load_rfield(rparams);
    const int Lr = fr.L;
    // keep the recurrence in Montgomery form; one exit conversion per s
    std::vector<u64> sm((n ? n : 1) * Lr);
    std::vector<u64> um(lg_n * Lr);
    for (u64 k = 0; k < lg_n; k++)
        fr.abi_to_mont(u_sq + k * Lr, um.data() + k * Lr);
    fr.abi_to_mont(prod_inv, sm.data());
    fr.mont_to_abi(sm.data(), s_out);
    int lg_i = 0;
    for (u64 i = 1; i < n; i++) {
        while ((u64)1 << (lg_i + 1) <= i) lg_i++;
        const u64 prev = i - ((u64)1 << lg_i);
        fr.mont_mul(sm.data() + prev * Lr,
                    um.data() + ((lg_n - 1) - (u64)lg_i) * Lr,
                    sm.data() + i * Lr);
        fr.mont_to_abi(sm.data() + i * Lr, s_out + i * Lr);
    }
}

// acc[j] += x * vec[j] mod r over plain-limb vectors (reverse indexes vec
// back-to-front — the IPA h-side consumes s reversed).  The batch-verify
// scalar-combination loops (k proofs x 2n terms) were Python modmuls.
void bp_axpy_mod_r(const u64* rparams, u64* acc, const u64* x,
                   const u64* vec, u64 n, u64 reverse) {
    Field fr = load_rfield(rparams);
    const int Lr = fr.L;
    u64 x_m[MAXL], p[MAXL];
    fr.abi_to_mont(x, x_m);
    for (u64 j = 0; j < n; j++) {
        const u64* v = vec + (reverse ? (n - 1 - j) : j) * Lr;
        fr.mont_mul(x_m, v, p);                     // x*vec[j] (plain)
        fr.add(acc + j * Lr, p, acc + j * Lr);
    }
}

// 4-term fold: out[i] = s1[i]*P1[i] + ... + s4[i]*P4[i] (full-width
// scalars; the paired-round IPA's combined base fold).
void bp_fold4(const u64* params, const u64* P1, const u64* P2,
              const u64* P3, const u64* P4, const u64* s1, const u64* s2,
              const u64* s3, const u64* s4, u64 n, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
#if defined(__x86_64__)
        if (!c.a_nonzero) {
            fold4_impl8(c52, P1, P2, P3, P4, s1, s2, s3, s4, n, out);
            return;
        }
#endif
        fold4_impl(c52, P1, P2, P3, P4, s1, s2, s3, s4, n, out);
    } else {
        fold4_impl(c, P1, P2, P3, P4, s1, s2, s3, s4, n, out);
    }
}

// Paired-round L/R: the current round's bases are IMPLICIT — G, H are the
// UNFOLDED previous-round buffers (length 2*nB, optional per-element
// factors fG/fH) and the fold by the previous challenge uA is expanded
// into the MSM scalars, so each L/R MSM runs over 2*nB+1 points instead
// of nB+1 and the nB-output materializing fold is skipped entirely
// (deferred to one 4-term fold per round pair).
void bp_ipp_round_lr_exp(const u64* params, const u64* rparams,
                         const u64* glv, const u64* G, const u64* H,
                         const u64* a, const u64* b, const u64* fG,
                         const u64* fH, const u64* Q, u64 nB,
                         const u64* uA, const u64* uA_inv, u64* outLR) {
    CurveT<Field> c = load_curve(params);
    Field fr = load_rfield(rparams);
    const int L = c.fp.L64, Lr = fr.L;
    const u64 nB2 = nB / 2;
    u64 uAm[MAXL], uAim[MAXL], tm[MAXL], tp[MAXL];
    fr.mont_mul(uA, fr.r2, uAm);
    fr.mont_mul(uA_inv, fr.r2, uAim);
    // s = fac * u * x (plain): fac*R -> fac*u*R -> fac*u*x
    auto triple = [&](const u64* fac, const u64* u_m, const u64* x,
                      u64* dst) {
        if (fac) {
            u64 f1[MAXL], f2[MAXL];
            fr.mont_mul(fac, fr.r2, f1);       // fac*R
            fr.mont_mul(f1, u_m, f2);          // fac*u*R
            fr.mont_mul(f2, x, dst);           // fac*u*x plain
        } else {
            fr.mont_mul(u_m, x, dst);
        }
    };
    u64 cl[MAXL] = {0}, cr[MAXL] = {0};
    for (u64 i = 0; i < nB2; i++) {
        fr.mont_mul(b + (nB2 + i) * Lr, fr.r2, tm);
        fr.mont_mul(tm, a + i * Lr, tp);
        fr.add(cl, tp, cl);
        fr.mont_mul(b + i * Lr, fr.r2, tm);
        fr.mont_mul(tm, a + (nB2 + i) * Lr, tp);
        fr.add(cr, tp, cr);
    }
    const u64 npts = 2 * nB + 1;
    std::vector<u64> pts(npts * 3 * L);
    std::vector<u64> sc(npts * Lr, 0);
    const u64 slice = nB2 * 3 * L;
    // ---- L over [G[nB2:nB] | G[nB+nB2:2nB] | H[0:nB2] | H[nB:nB+nB2] | Q]
    memcpy(&pts[0], G + nB2 * 3 * L, slice * sizeof(u64));
    memcpy(&pts[slice], G + (nB + nB2) * 3 * L, slice * sizeof(u64));
    memcpy(&pts[2 * slice], H, slice * sizeof(u64));
    memcpy(&pts[3 * slice], H + nB * 3 * L, slice * sizeof(u64));
    memcpy(&pts[4 * slice], Q, 3 * L * sizeof(u64));
    for (u64 i = 0; i < nB2; i++) {
        const u64* aL = a + i * Lr;
        const u64* bR = b + (nB2 + i) * Lr;
        triple(fG ? fG + (nB2 + i) * Lr : 0, uAim, aL, &sc[i * Lr]);
        triple(fG ? fG + (nB + nB2 + i) * Lr : 0, uAm, aL,
               &sc[(nB2 + i) * Lr]);
        triple(fH ? fH + i * Lr : 0, uAm, bR, &sc[(2 * nB2 + i) * Lr]);
        triple(fH ? fH + (nB + i) * Lr : 0, uAim, bR,
               &sc[(3 * nB2 + i) * Lr]);
    }
    memcpy(&sc[2 * nB * Lr], cl, Lr * sizeof(u64));
    bp_msm2(params, glv, pts.data(), sc.data(), npts, outLR);
    // ---- R over [G[0:nB2] | G[nB:nB+nB2] | H[nB2:nB] | H[nB+nB2:2nB] | Q]
    memcpy(&pts[0], G, slice * sizeof(u64));
    memcpy(&pts[slice], G + nB * 3 * L, slice * sizeof(u64));
    memcpy(&pts[2 * slice], H + nB2 * 3 * L, slice * sizeof(u64));
    memcpy(&pts[3 * slice], H + (nB + nB2) * 3 * L, slice * sizeof(u64));
    for (u64 i = 0; i < nB2; i++) {
        const u64* aR = a + (nB2 + i) * Lr;
        const u64* bL = b + i * Lr;
        triple(fG ? fG + i * Lr : 0, uAim, aR, &sc[i * Lr]);
        triple(fG ? fG + (nB + i) * Lr : 0, uAm, aR, &sc[(nB2 + i) * Lr]);
        triple(fH ? fH + (nB2 + i) * Lr : 0, uAm, bL,
               &sc[(2 * nB2 + i) * Lr]);
        triple(fH ? fH + (nB + nB2 + i) * Lr : 0, uAim, bL,
               &sc[(3 * nB2 + i) * Lr]);
    }
    memcpy(&sc[2 * nB * Lr], cr, Lr * sizeof(u64));
    bp_msm2(params, glv, pts.data(), sc.data(), npts, outLR + 3 * L);
}

void bp_scalar_mul_batch(const u64* params, const u64* P, const u64* k,
                         u64 n, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
        scalar_mul_batch_impl(c52, P, k, n, out);
    } else {
        scalar_mul_batch_impl(c, P, k, n, out);
    }
}

void bp_combine_rowcol(const u64* params, const u64* rowsum,
                       const u64* colsum, u64 nwin, u64 gsize, u64 ksize,
                       u64 cbits, u64 wins_per_set, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
        combine_rowcol_impl(c52, rowsum, colsum, nwin, gsize, ksize,
                            cbits, wins_per_set, out);
    } else {
        combine_rowcol_impl(c, rowsum, colsum, nwin, gsize, ksize,
                            cbits, wins_per_set, out);
    }
}

void bp_combine_totals(const u64* params, const u64* totals, u64 nwin,
                       u64 cbits, u64 wins_per_set, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
        combine_totals_impl(c52, totals, nwin, cbits, wins_per_set, out);
    } else {
        combine_totals_impl(c, totals, nwin, cbits, wins_per_set, out);
    }
}

void bp_add_batch(const u64* params, const u64* P, const u64* Q,
                  u64 n, u64* out) {
    CurveT<Field> c = load_curve(params);
    if (ifma_available()) {
        CurveT<Field52> c52 = to52(c);
        add_batch_impl(c52, P, Q, n, out);
    } else {
        add_batch_impl(c, P, Q, n, out);
    }
}

}  // extern "C"
