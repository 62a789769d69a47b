// Native witness-resolution engine.
//
// The reference's witness runtime is 7.5k LoC of lock-free multithreaded
// Rust (src/dag/). The TPU build replaces the DAG with a recorded, already
// dependency-ordered vectorized program (boojum_tpu/cs/resolver.py); this
// C++ engine executes the hot primitive of that program — gather inputs,
// apply a Goldilocks op, scatter outputs — without numpy's per-call
// overhead, and provides bulk field kernels for host-side witness math.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;

static const u64 P = 0xFFFFFFFF00000001ull;
static const u64 EPS = 0xFFFFFFFFull;

static inline u64 reduce128(u128 x) {
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_lo = hi & EPS;        // bits 64..96
  u64 hi_hi = hi >> 32;        // bits 96..128
  // lo + hi_lo * (2^32 - 1) - hi_hi  (mod p)
  u64 t = lo + (hi_lo << 32) - hi_lo;
  if (t < lo && hi_lo != 0) t += EPS;  // wrapped past 2^64
  // subtract hi_hi
  u64 r = t - hi_hi;
  if (t < hi_hi) r -= EPS;
  if (r >= P) r -= P;
  return r;
}

static inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  if (s < a) s += EPS;
  if (s >= P) s -= P;
  return s;
}

static inline u64 gl_sub(u64 a, u64 b) {
  u64 d = a - b;
  if (a < b) d -= EPS;
  return d;
}

static inline u64 gl_mul(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 gl_pow(u64 a, u64 e) {
  u64 r = 1;
  while (e) {
    if (e & 1) r = gl_mul(r, a);
    a = gl_mul(a, a);
    e >>= 1;
  }
  return r;
}

extern "C" {

// elementwise kernels ------------------------------------------------------

void gl_add_arrays(const u64* a, const u64* b, u64* out, long n) {
  for (long i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

void gl_sub_arrays(const u64* a, const u64* b, u64* out, long n) {
  for (long i = 0; i < n; i++) out[i] = gl_sub(a[i], b[i]);
}

void gl_mul_arrays(const u64* a, const u64* b, u64* out, long n) {
  for (long i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

void gl_mul_scalar(const u64* a, u64 k, u64* out, long n) {
  for (long i = 0; i < n; i++) out[i] = gl_mul(a[i], k);
}

void gl_inv_arrays(const u64* a, u64* out, long n) {
  // batched Montgomery inversion (sequential chain — cheap in native code)
  if (n == 0) return;
  u64* prefix = out;  // reuse the output as scratch for prefix products
  u64 acc = 1;
  for (long i = 0; i < n; i++) {
    prefix[i] = acc;
    u64 v = a[i] ? a[i] : 1;  // 0 handled below
    acc = gl_mul(acc, v);
  }
  u64 inv = gl_pow(acc, P - 2);
  for (long i = n - 1; i >= 0; i--) {
    u64 v = a[i] ? a[i] : 1;
    u64 r = gl_mul(inv, prefix[i]);
    inv = gl_mul(inv, v);
    out[i] = a[i] ? r : 0;
  }
}

void gl_powers(u64 base, u64* out, long n) {
  u64 cur = 1;
  for (long i = 0; i < n; i++) {
    out[i] = cur;
    cur = gl_mul(cur, base);
  }
}

// witness-program primitives ----------------------------------------------

// values[out_idx[i]] = values[in_idx[i]] (bulk copy through an index map)
void gather_scatter(const u64* values, const long* in_idx, u64* out_values,
                    const long* out_idx, long n) {
  for (long i = 0; i < n; i++) out_values[out_idx[i]] = values[in_idx[i]];
}

// fused fma witness node: out = c0 * a * b + c1 * c over gathered indices
void fma_node(u64* values, const long* a_idx, const long* b_idx,
              const long* c_idx, const long* out_idx, u64 c0, u64 c1,
              long n) {
  for (long i = 0; i < n; i++) {
    u64 t = gl_mul(gl_mul(c0, values[a_idx[i]]), values[b_idx[i]]);
    values[out_idx[i]] = gl_add(t, gl_mul(c1, values[c_idx[i]]));
  }
}

// fused linear-combination node: out = sum_j coeffs[j] * vals[idx[j][i]]
void reduce_node(u64* values, const long* idx, const u64* coeffs, long k,
                 const long* out_idx, long n) {
  for (long i = 0; i < n; i++) {
    u64 acc = 0;
    for (long j = 0; j < k; j++)
      acc = gl_add(acc, gl_mul(coeffs[j], values[idx[j * n + i]]));
    values[out_idx[i]] = acc;
  }
}

u64 self_test() {
  // (p-1)^2 mod p == 1 ; inverse sanity
  u64 a = P - 1;
  if (gl_mul(a, a) != 1) return 1;
  u64 x = 1234567890123456789ull % P;
  if (gl_mul(x, gl_pow(x, P - 2)) != 1) return 2;
  return 0;
}

}  // extern "C"
