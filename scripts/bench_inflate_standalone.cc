// Standalone correctness + throughput harness for the fast raw-DEFLATE
// decoder (inflate_fast.cc), runnable without Python:
//
//   g++ -O3 -march=native -o /tmp/bench_inflate \
//       scripts/bench_inflate_standalone.cc gkl_tpu/native/inflate_fast.cc -lz
//   /tmp/bench_inflate [mb]
//
// Corpora: random ACGT (the bench.py codec corpus: zlib-1 encodes it almost
// entirely as ~4-byte matches, so it exercises the latency-bound match
// path) and a BAM-record-like mix (names + flags + packed bases + quals).
// Each corpus is split into 65280-byte BGZF-sized blocks, compressed with
// raw zlib-1, decoded via zlib / 1-way / 2-way / 4-way, verified
// byte-identical, and timed.

#include <zlib.h>

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int gkl_fast_inflate(const uint8_t* in, int n, uint8_t* out,
                                int out_cap);
extern "C" void gkl_fast_inflate_n(const uint8_t* const* ins,
                                   const int32_t* ns, uint8_t* const* outs,
                                   const int32_t* caps, int32_t* rs, int n);
extern "C" int gkl_fast_deflate_dyn(const uint8_t* in, int n, uint8_t* out,
                                    int cap, int level);

namespace {

uint64_t rng_state = 0x9E3779B97F4A7C15ull;
inline uint32_t rnd() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (uint32_t)(rng_state >> 32);
}

std::vector<uint8_t> corpus_dna(size_t n) {
  static const char b[4] = {'A', 'C', 'G', 'T'};
  std::vector<uint8_t> v(n);
  for (size_t i = 0; i < n; ++i) v[i] = (uint8_t)b[rnd() & 3];
  return v;
}

std::vector<uint8_t> corpus_bamish(size_t n) {
  // name(24B text) + 16B of little-endian fields + 50B packed 4-bit bases +
  // 100B quals in a narrow band — the shape of decoded BAM record payloads
  std::vector<uint8_t> v;
  v.reserve(n + 256);
  uint32_t rid = 0;
  while (v.size() < n) {
    char name[32];
    int ln = snprintf(name, sizeof name, "HSQ1004:134:C0D8D:%u", rid++);
    v.insert(v.end(), name, name + ln);
    for (int i = 0; i < 16; ++i) v.push_back((uint8_t)(rnd() & 0xFF));
    for (int i = 0; i < 50; ++i) v.push_back((uint8_t)(rnd() & 0x77));
    for (int i = 0; i < 100; ++i) v.push_back((uint8_t)(33 + (rnd() % 8)));
  }
  v.resize(n);
  return v;
}

struct Blocks {
  std::vector<std::vector<uint8_t>> raw, comp;
};

// fast_l1: compress with the repo's own L1 encoder (deflate_fast.cc) — the
// bench.py inflate metric decodes exactly that encoder's output, whose
// match/code statistics differ from zlib-1's.
Blocks make_blocks(const std::vector<uint8_t>& data, bool fast_l1) {
  Blocks bl;
  const size_t bs = 65280;
  for (size_t off = 0; off < data.size(); off += bs) {
    size_t n = data.size() - off < bs ? data.size() - off : bs;
    bl.raw.emplace_back(data.begin() + off, data.begin() + off + n);
    std::vector<uint8_t> out(n + (n >> 2) + 1024);
    if (fast_l1) {
      int r = gkl_fast_deflate_dyn(bl.raw.back().data(), (int)n, out.data(),
                                   (int)out.size(), 1);
      if (r < 0) {
        std::fprintf(stderr, "fast deflate failed\n");
        std::exit(1);
      }
      out.resize(r);
    } else {
      z_stream zs;
      std::memset(&zs, 0, sizeof zs);
      deflateInit2(&zs, 1, Z_DEFLATED, -MAX_WBITS, 8, Z_DEFAULT_STRATEGY);
      zs.next_in = const_cast<Bytef*>(bl.raw.back().data());
      zs.avail_in = (uInt)n;
      zs.next_out = out.data();
      zs.avail_out = (uInt)out.size();
      if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
        std::fprintf(stderr, "deflate failed\n");
        std::exit(1);
      }
      out.resize(out.size() - zs.avail_out);
      deflateEnd(&zs);
    }
    bl.comp.push_back(std::move(out));
  }
  return bl;
}

double now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

int run_zlib(const std::vector<uint8_t>& in, uint8_t* out, int cap) {
  z_stream zs;
  std::memset(&zs, 0, sizeof zs);
  inflateInit2(&zs, -MAX_WBITS);
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = (uInt)in.size();
  zs.next_out = out;
  zs.avail_out = (uInt)cap;
  int r = inflate(&zs, Z_FINISH);
  int w = (int)(cap - zs.avail_out);
  inflateEnd(&zs);
  return r == Z_STREAM_END ? w : -1;
}

void bench_corpus(const char* label, const std::vector<uint8_t>& data,
                  int reps, bool fast_l1 = false) {
  Blocks bl = make_blocks(data, fast_l1);
  int nb = (int)bl.comp.size();
  size_t total = data.size(), ctotal = 0;
  for (auto& c : bl.comp) ctotal += c.size();
  const int cap = 65280 + 64;
  std::vector<uint8_t> outbuf((size_t)cap * nb);

  // correctness first: 1-way and every gang width (and a width-3 tail)
  for (int i = 0; i < nb; ++i) {
    int r = gkl_fast_inflate(bl.comp[i].data(), (int)bl.comp[i].size(),
                             outbuf.data() + (size_t)i * cap, cap);
    if (r != (int)bl.raw[i].size() ||
        std::memcmp(outbuf.data() + (size_t)i * cap, bl.raw[i].data(), r)) {
      std::fprintf(stderr, "1-way mismatch at block %d (r=%d)\n", i, r);
      std::exit(1);
    }
  }
  for (int width = 2; width <= 4; ++width) {
    for (int i = 0; i < nb; i += width) {
      int m = nb - i < width ? nb - i : width;
      const uint8_t* ins[4];
      uint8_t* outs[4];
      int32_t ns[4], caps[4], rs[4];
      for (int k = 0; k < m; ++k) {
        ins[k] = bl.comp[i + k].data();
        ns[k] = (int32_t)bl.comp[i + k].size();
        outs[k] = outbuf.data() + (size_t)(i + k) * cap;
        caps[k] = cap;
        std::memset(outs[k], 0xAA, cap);
      }
      gkl_fast_inflate_n(ins, ns, outs, caps, rs, m);
      for (int k = 0; k < m; ++k) {
        if (rs[k] != (int)bl.raw[i + k].size() ||
            std::memcmp(outs[k], bl.raw[i + k].data(), rs[k])) {
          std::fprintf(stderr, "%d-way mismatch at block %d (r=%d)\n", width,
                       i + k, rs[k]);
          std::exit(1);
        }
      }
    }
  }

  // interleave the variants inside each rep: this host's clock wanders by
  // 2x across seconds, so per-variant best-of must sample the SAME windows
  auto run_z = [&] {
    for (int i = 0; i < nb; ++i)
      run_zlib(bl.comp[i], outbuf.data() + (size_t)i * cap, cap);
  };
  auto run_1 = [&] {
    for (int i = 0; i < nb; ++i)
      gkl_fast_inflate(bl.comp[i].data(), (int)bl.comp[i].size(),
                       outbuf.data() + (size_t)i * cap, cap);
  };
  auto run_gang = [&](int width) {
    for (int i = 0; i < nb; i += width) {
      int m = nb - i < width ? nb - i : width;
      const uint8_t* ins[4];
      uint8_t* outs[4];
      int32_t ns[4], caps[4], rs[4];
      for (int k = 0; k < m; ++k) {
        ins[k] = bl.comp[i + k].data();
        ns[k] = (int32_t)bl.comp[i + k].size();
        outs[k] = outbuf.data() + (size_t)(i + k) * cap;
        caps[k] = cap;
      }
      gkl_fast_inflate_n(ins, ns, outs, caps, rs, m);
    }
  };
  double tz = 9e9, t1 = 9e9, t2 = 9e9, t3 = 9e9, t4 = 9e9;
  auto sample = [&](double& best, auto fn) {
    double t0 = now();
    fn();
    double dt = now() - t0;
    if (dt < best) best = dt;
  };
  for (int r = 0; r < reps; ++r) {
    sample(tz, run_z);
    sample(t1, run_1);
    sample(t2, [&] { run_gang(2); });
    sample(t3, [&] { run_gang(3); });
    sample(t4, [&] { run_gang(4); });
  }
  double mb = total / 1e6;
  std::printf(
      "%s: %zu blocks ratio %.3f | zlib %.0f MB/s | 1w %.0f (%.2fx) | "
      "2w %.0f (%.2fx) | 3w %.0f (%.2fx) | 4w %.0f (%.2fx)\n",
      label, bl.comp.size(), (double)ctotal / total, mb / tz, mb / t1,
      tz / t1, mb / t2, tz / t2, mb / t3, tz / t3, mb / t4, tz / t4);
}

}  // namespace

int main(int argc, char** argv) {
  size_t mb = argc > 1 ? (size_t)std::atoi(argv[1]) : 8;
  int reps = argc > 2 ? std::atoi(argv[2]) : 5;
  bench_corpus("dna   ", corpus_dna(mb << 20), reps);
  bench_corpus("dnaL1 ", corpus_dna(mb << 20), reps, true);
  bench_corpus("bamish", corpus_bamish(mb << 20), reps);
  bench_corpus("bamL1 ", corpus_bamish(mb << 20), reps, true);
  return 0;
}
