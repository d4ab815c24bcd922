// Native host-side BN254 field helpers for the zkey/staging pipeline.
//
// The role of this file is the same as ark-ff's x86 asm backend in the
// reference stack (Cargo.toml:25 `features = ["asm"]`): bulk Montgomery
// arithmetic on the HOST, used where the data is still host-resident —
// stripping the R factor from multi-million-entry .zkey coefficient
// sections (reference: src/zkey.rs:320-325 reads Fr values stored as
// v*R^2 and reduces once) before limb-decomposed device staging.
//
// Layout contract: elements are contiguous 32-byte little-endian values —
// the .zkey wire encoding, which on a little-endian machine is also the
// byte image of both the numpy (n, 16) uint16 limb arrays and the 4x64
// limb vectors used here.  So the strip is a cast, not a conversion.
//
// Build: g++ -O3 -shared -fPIC (driven on demand from
// circom_compat_tpu/ops/native_field.py, same pattern as wasm_vm.cpp).

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

typedef unsigned __int128 u128;

// out = a * 2^-256 mod p (Montgomery REDC, 4x64 CIOS). np64 = -p^-1 mod 2^64.
// Valid for any a < 2^256 (< R*p); result fully reduced to [0, p).
static inline void redc_one(const uint64_t* a, uint64_t* out,
                            const uint64_t* p, uint64_t np64) {
  uint64_t t0 = a[0], t1 = a[1], t2 = a[2], t3 = a[3], t4 = 0;
  for (int i = 0; i < 4; ++i) {
    uint64_t m = t0 * np64;
    u128 s = (u128)m * p[0] + t0;
    uint64_t c = (uint64_t)(s >> 64);
    s = (u128)m * p[1] + t1 + c; t0 = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)m * p[2] + t2 + c; t1 = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)m * p[3] + t3 + c; t2 = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)t4 + c;            t3 = (uint64_t)s; t4 = (uint64_t)(s >> 64);
  }
  // conditional subtract: result < 2p, so one pass suffices.
  u128 d = (u128)t0 - p[0];
  uint64_t r0 = (uint64_t)d, br = (uint64_t)(d >> 64) & 1;
  d = (u128)t1 - p[1] - br; uint64_t r1 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  d = (u128)t2 - p[2] - br; uint64_t r2 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  d = (u128)t3 - p[3] - br; uint64_t r3 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  if (t4 || !br) { out[0] = r0; out[1] = r1; out[2] = r2; out[3] = r3; }
  else           { out[0] = t0; out[1] = t1; out[2] = t2; out[3] = t3; }
}

// out = a * b * 2^-256 mod p (Montgomery CIOS multiply), fully reduced.
static inline void mont_mul_one(const uint64_t* a, const uint64_t* b,
                                uint64_t* out, const uint64_t* p, uint64_t np64) {
  uint64_t t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    uint64_t c = 0;
    u128 s;
    s = (u128)a[0] * b[i] + t[0];     t[0] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)a[1] * b[i] + t[1] + c; t[1] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)a[2] * b[i] + t[2] + c; t[2] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)a[3] * b[i] + t[3] + c; t[3] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)t[4] + c;               t[4] = (uint64_t)s;
    uint64_t hi = (uint64_t)(s >> 64);

    uint64_t m = t[0] * np64;
    s = (u128)m * p[0] + t[0];        c = (uint64_t)(s >> 64);
    s = (u128)m * p[1] + t[1] + c;    t[0] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)m * p[2] + t[2] + c;    t[1] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)m * p[3] + t[3] + c;    t[2] = (uint64_t)s; c = (uint64_t)(s >> 64);
    s = (u128)t[4] + c;               t[3] = (uint64_t)s;
    t[4] = hi + (uint64_t)(s >> 64);
  }
  u128 d = (u128)t[0] - p[0];
  uint64_t r0 = (uint64_t)d, br = (uint64_t)(d >> 64) & 1;
  d = (u128)t[1] - p[1] - br; uint64_t r1 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  d = (u128)t[2] - p[2] - br; uint64_t r2 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  d = (u128)t[3] - p[3] - br; uint64_t r3 = (uint64_t)d; br = (uint64_t)(d >> 64) & 1;
  if (t[4] || !br) { out[0] = r0; out[1] = r1; out[2] = r2; out[3] = r3; }
  else { out[0] = t[0]; out[1] = t[1]; out[2] = t[2]; out[3] = t[3]; }
}

static void run_threaded(uint64_t n, int nthreads,
                         const std::function<void(uint64_t, uint64_t)>& body) {
  if (nthreads <= 1 || n < 4096) { body(0, n); return; }
  std::vector<std::thread> ts;
  uint64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    uint64_t lo = (uint64_t)t * chunk;
    if (lo >= n) break;
    uint64_t hi = lo + chunk < n ? lo + chunk : n;
    ts.emplace_back([&body, lo, hi] { body(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// out[i] = in[i] * 2^-256 mod p for n contiguous 32-byte LE elements.
void mont_strip(const uint8_t* in, uint8_t* out, uint64_t n,
                const uint64_t* p, uint64_t np64, int nthreads) {
  run_threaded(n, nthreads, [=](uint64_t lo, uint64_t hi) {
    uint64_t a[4], r[4];
    for (uint64_t i = lo; i < hi; ++i) {
      std::memcpy(a, in + i * 32, 32);
      redc_one(a, r, p, np64);
      std::memcpy(out + i * 32, r, 32);
    }
  });
}

// out[i] = in[i] * c * 2^-256 mod p — one shared Montgomery factor applied
// across a section (e.g. ceremony delta^-1 rescaling of Fr vectors).
void mont_mul_const(const uint8_t* in, uint8_t* out, uint64_t n,
                    const uint64_t* c_limbs, const uint64_t* p, uint64_t np64,
                    int nthreads) {
  run_threaded(n, nthreads, [=](uint64_t lo, uint64_t hi) {
    uint64_t a[4], r[4];
    for (uint64_t i = lo; i < hi; ++i) {
      std::memcpy(a, in + i * 32, 32);
      mont_mul_one(a, c_limbs, r, p, np64);
      std::memcpy(out + i * 32, r, 32);
    }
  });
}

}  // extern "C"
