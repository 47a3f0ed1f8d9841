// helm_tpu native data loader: CSV test-vector parsing + threaded batch
// LWE encryption.
//
// C++ counterpart of the host-side client I/O layer (reference: Rust
// src/verilog_parser.rs:278-349 read_input_wires/write_output_wires and the
// encrypt-inputs role of src/circuit.rs:450-480). The TPU compute path is
// JAX/Pallas; this library owns the client-side runtime work for GIANT
// batched-serving vector sets: parsing many CSV files and filling the
// [M, n+1] ciphertext slab with all cores, streaming straight into a
// caller-provided buffer (no per-row Python dispatch).
//
// ABI:
//   helm_read_input_csv(path, is_bool) -> malloc'd "wire=value\n" lines with
//     hex-width rows already expanded to per-bit wires (little-endian index,
//     reference src/lib.rs:181-194); helm_free() releases it.
//   helm_encrypt_lwe(key, n, mu, m, noise_std, seed, nthreads, out) fills
//     out[m][n+1] with LWE encryptions b = <a,s> + mu_i + e (q = 2^32,
//     wrapping). PRNG: per-thread xoshiro256** seeded via splitmix64 —
//     benchmark-grade randomness, matching the numpy-PCG64 Python path's
//     threat model (neither is a hedged CSPRNG).

#include <cctype>
#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Xoshiro {
  uint64_t s[4];
  explicit Xoshiro(uint64_t seed) {
    // splitmix64 expansion
    for (int i = 0; i < 4; i++) {
      seed += 0x9E3779B97F4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  double uniform01() {  // (0, 1]
    return ((next() >> 11) + 1) * 0x1.0p-53;
  }
};

void encrypt_rows(const uint32_t* key, int n, const uint32_t* mu, long lo,
                  long hi, double noise_std, uint64_t seed, uint32_t* out) {
  Xoshiro rng(seed);
  const long stride = n + 1;
  for (long r = lo; r < hi; r++) {
    uint32_t* row = out + r * stride;
    uint64_t dot = 0;
    long i = 0;
    // draw the mask 2 lanes per 64-bit PRNG output
    for (; i + 1 < n; i += 2) {
      uint64_t v = rng.next();
      uint32_t a0 = (uint32_t)v, a1 = (uint32_t)(v >> 32);
      row[i] = a0;
      row[i + 1] = a1;
      dot += (uint64_t)a0 * key[i] + (uint64_t)a1 * key[i + 1];
    }
    if (i < n) {
      uint32_t a0 = (uint32_t)rng.next();
      row[i] = a0;
      dot += (uint64_t)a0 * key[i];
    }
    int64_t e = 0;
    if (noise_std > 0.0) {
      // Box-Muller, rounded like the numpy path (rint of normal(0, std))
      double u1 = rng.uniform01(), u2 = rng.uniform01();
      double g = std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
      e = (int64_t)std::llrint(g * noise_std);
    }
    row[n] = (uint32_t)dot + mu[r] + (uint32_t)(int32_t)e;
  }
}

std::string strip(const std::string& sv) {
  size_t b = sv.find_first_not_of(" \t\r\n");
  if (b == std::string::npos) return "";
  size_t e = sv.find_last_not_of(" \t\r\n");
  return sv.substr(b, e - b + 1);
}

}  // namespace

extern "C" {

// Threaded batch LWE encryption. key: u32[n] (any values; binary for TFHE),
// mu: u32[m] torus messages, out: u32[m*(n+1)]. Wrapping mod 2^32.
void helm_encrypt_lwe(const uint32_t* key, int n, const uint32_t* mu, long m,
                      double noise_std, uint64_t seed, int nthreads,
                      uint32_t* out) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads <= 1 || m < 64) {
    encrypt_rows(key, n, mu, 0, m, noise_std, seed, out);
    return;
  }
  std::vector<std::thread> ts;
  long chunk = (m + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    long lo = t * chunk, hi = std::min(m, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(encrypt_rows, key, n, mu, lo, hi, noise_std,
                    seed + 0x1000003ULL * (uint64_t)(t + 1), out);
  }
  for (auto& th : ts) th.join();
}

// Parse an input-wire CSV (reference formats: `wire,value` or bool
// `wire,hex,width` with little-endian bit expansion). Returns malloc'd
// "name=value\n" text (value: 0/1 for bool, decimal otherwise), or NULL on
// unreadable file. An optional first header row (wire/name/...) is skipped.
char* helm_read_input_csv(const char* path, int is_bool) {
  std::ifstream f(path);
  if (!f.good()) return nullptr;
  std::ostringstream outbuf;
  std::string line;
  bool first = true;
  while (std::getline(f, line)) {
    std::vector<std::string> cols;
    std::stringstream ss(line);
    std::string c;
    while (std::getline(ss, c, ',')) cols.push_back(strip(c));
    if (cols.empty() || (cols.size() == 1 && cols[0].empty())) continue;
    if (first) {
      first = false;
      std::string h = cols[0];
      for (auto& ch : h) ch = (char)tolower((unsigned char)ch);
      if (h == "wire" || h == "wire_name" || h == "name") continue;
    }
    if (cols.size() == 2) {
      if (is_bool) {
        std::string v = cols[1];
        for (auto& ch : v) ch = (char)tolower((unsigned char)ch);
        outbuf << cols[0] << "=" << ((v == "1" || v == "true") ? 1 : 0) << "\n";
      } else {
        outbuf << cols[0] << "=" << cols[1] << "\n";
      }
    } else if (cols.size() == 3 && is_bool) {
      long width = strtol(cols[2].c_str(), nullptr, 10);
      if (width <= 1) {
        std::string v = cols[1];
        for (auto& ch : v) ch = (char)tolower((unsigned char)ch);
        outbuf << cols[0] << "=" << ((v == "1" || v == "true") ? 1 : 0) << "\n";
        continue;
      }
      // hex -> bitstring (4 bits per digit, MSB first), then reverse-index
      const std::string& hex = cols[1];
      std::string bits;
      bits.reserve(hex.size() * 4);
      for (char hc : hex) {
        if (!isxdigit((unsigned char)hc)) return nullptr;  // ValueError parity
        int v = isdigit((unsigned char)hc)
                    ? hc - '0'
                    : 10 + (tolower((unsigned char)hc) - 'a');
        for (int b = 3; b >= 0; b--) bits.push_back((char)('0' + ((v >> b) & 1)));
      }
      std::string rev(bits.rbegin(), bits.rend());
      for (long idx = 0; idx < width; idx++) {
        int bit = idx < (long)rev.size() && rev[(size_t)idx] == '1';
        outbuf << cols[0] << "[" << idx << "]=" << bit << "\n";
      }
    } else {
      return nullptr;  // malformed row: mirror the Python ValueError
    }
  }
  std::string s = outbuf.str();
  char* ret = (char*)malloc(s.size() + 1);
  std::memcpy(ret, s.c_str(), s.size() + 1);
  return ret;
}

void helm_loader_free(char* p) { free(p); }

}  // extern "C"
