// Host-side DEFLATE codec stage.
//
// The reference accelerates BAM block compression with ISA-L (levels 1-2)
// and a patched zlib (levels 0,3-9) behind JNI single-shot calls
// (compression/IntelDeflater.cc:164-362, IntelInflater.cc).  The TPU-native
// equivalent is a host codec stage that feeds the device pipeline: the same
// single-shot block semantics on top of system zlib, plus a multi-threaded
// batch API sized for BGZF block streams (std::thread workers; ctypes calls
// release the GIL so the pool runs truly parallel).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Fast fixed-Huffman DEFLATE encoder (the ISA-L igzip analogue for levels
// 1-2; the reference routes those levels to isal_deflate_stateless,
// compression/IntelDeflater.cc:184-275, and restricts them to raw streams,
// IntelDeflater.java:95-97).  Greedy LZ77 over a 15-bit hash of 4-byte
// windows, all symbols emitted with the fixed Huffman tables (BTYPE=01),
// single final block.  Output is standard DEFLATE, decodable by any
// inflater; byte-identity with ISA-L/zlib is not a contract — round-trip
// and cross-implementation compatibility are.
// ---------------------------------------------------------------------------

struct BitWriter {
  uint8_t* out;
  int cap;
  int pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  bool overflow = false;

  void put(uint32_t bits, int n) {
    acc |= (uint64_t)bits << nbits;
    nbits += n;
    while (nbits >= 8) {
      if (pos >= cap) {
        overflow = true;
        nbits = 0;
        return;
      }
      out[pos++] = (uint8_t)acc;
      acc >>= 8;
      nbits -= 8;
    }
  }
  int finish() {
    if (nbits > 0) {
      if (pos >= cap) return -1;
      out[pos++] = (uint8_t)acc;
    }
    return overflow ? -1 : pos;
  }
};

inline uint32_t bit_reverse(uint32_t v, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; ++i) r |= ((v >> i) & 1u) << (n - 1 - i);
  return r;
}

struct FixedTables {
  uint16_t lit_code[256];
  uint8_t lit_bits[256];
  uint16_t len_code[259];   // match length 3..258 -> reversed huffman code
  uint8_t len_bits[259];    // huffman bits
  uint16_t len_extra[259];  // extra-bit value
  uint8_t len_extra_bits[259];
  uint16_t dist_code[30];  // reversed 5-bit code per distance bucket
  uint16_t dist_base[30];
  uint8_t dist_extra_bits[30];

  FixedTables() {
    for (int lit = 0; lit < 144; ++lit) {
      lit_code[lit] = (uint16_t)bit_reverse(0x30 + lit, 8);
      lit_bits[lit] = 8;
    }
    for (int lit = 144; lit < 256; ++lit) {
      lit_code[lit] = (uint16_t)bit_reverse(0x190 + (lit - 144), 9);
      lit_bits[lit] = 9;
    }
    static const int lbase[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11, 13,
                                  15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
                                  67, 83, 99, 115, 131, 163, 195, 227, 258};
    static const int lext[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                                 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
    for (int c = 0; c < 29; ++c) {
      int sym = 257 + c;
      int hi = (c == 28) ? 258 : lbase[c + 1] - 1;
      for (int L = lbase[c]; L <= hi && L <= 258; ++L) {
        if (sym <= 279) {
          len_code[L] = (uint16_t)bit_reverse(sym - 256, 7);
          len_bits[L] = 7;
        } else {
          len_code[L] = (uint16_t)bit_reverse(0xC0 + (sym - 280), 8);
          len_bits[L] = 8;
        }
        len_extra[L] = (uint16_t)(L - lbase[c]);
        len_extra_bits[L] = (uint8_t)lext[c];
      }
    }
    static const int dbase[30] = {1,    2,    3,    4,    5,    7,     9,
                                  13,   17,   25,   33,   49,   65,    97,
                                  129,  193,  257,  385,  513,  769,   1025,
                                  1537, 2049, 3073, 4097, 6145, 8193,  12289,
                                  16385, 24577};
    static const int dext[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                                 4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                                 9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
    for (int c = 0; c < 30; ++c) {
      dist_code[c] = (uint16_t)bit_reverse(c, 5);
      dist_base[c] = (uint16_t)dbase[c];
      dist_extra_bits[c] = (uint8_t)dext[c];
    }
  }

  int dist_bucket(int d) const {
    // binary search over the 30 buckets (d in [1, 32768])
    int lo = 0, hi = 29;
    while (lo < hi) {
      int mid = (lo + hi + 1) >> 1;
      if (dist_base[mid] <= d) lo = mid;
      else hi = mid - 1;
    }
    return lo;
  }
};

const FixedTables kFixed;

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint32_t hash4(uint32_t v) { return (v * 2654435761u) >> 17; }  // 15-bit

constexpr int kHashSize = 1 << 15;
constexpr int kEOBCode = 0;  // code 256 = 0000000 (7 bits), reversed is 0

int fast_deflate_fixed(const uint8_t* in, int n, uint8_t* out, int cap,
                       int level) {
  BitWriter bw{out, cap};
  bw.put(1, 1);   // BFINAL
  bw.put(1, 2);   // BTYPE = 01 fixed Huffman
  std::vector<int32_t> head(kHashSize, -1);

  const FixedTables& T = kFixed;
  int pos = 0;
  while (pos < n) {
    int match_len = 0, match_dist = 0;
    if (pos + 4 <= n) {
      uint32_t v = read32(in + pos);
      uint32_t h = hash4(v);
      int cand = head[h];
      head[h] = pos;
      if (cand >= 0 && pos - cand <= 32768 && read32(in + cand) == v) {
        int limit = n - pos < 258 ? n - pos : 258;
        int L = 4;
        while (L < limit && in[cand + L] == in[pos + L]) ++L;
        match_len = L;
        match_dist = pos - cand;
      }
    }
    if (match_len >= 4) {
      bw.put(T.len_code[match_len], T.len_bits[match_len]);
      if (T.len_extra_bits[match_len])
        bw.put(T.len_extra[match_len], T.len_extra_bits[match_len]);
      int dc = T.dist_bucket(match_dist);
      bw.put(T.dist_code[dc], 5);
      if (T.dist_extra_bits[dc])
        bw.put((uint32_t)(match_dist - T.dist_base[dc]), T.dist_extra_bits[dc]);
      // hash-insert inside the match: level 1 skips (speed), level 2 inserts
      // every position of short matches (ratio)
      if (level >= 2 && match_len <= 32) {
        int stop = pos + match_len < n - 4 ? pos + match_len : n - 4;
        for (int q = pos + 1; q < stop; ++q) head[hash4(read32(in + q))] = q;
      }
      pos += match_len;
    } else {
      uint8_t lit = in[pos++];
      bw.put(T.lit_code[lit], T.lit_bits[lit]);
    }
    if (bw.overflow) return -1;
  }
  bw.put(kEOBCode, 7);  // end of block (symbol 256)
  return bw.finish();
}

bool fast_deflate_enabled() {
  static const bool v = [] {
    const char* e = std::getenv("GKL_TPU_FAST_DEFLATE");
    return e != nullptr && e[0] == '1';
  }();
  return v;
}

int do_deflate(const uint8_t* in, int in_len, uint8_t* out, int out_cap,
               int level, int nowrap) {
  // Opt-in speed-over-ratio mode (GKL_TPU_FAST_DEFLATE=1): ~1.5x zlib-1
  // throughput but fixed-Huffman ratios (poor on raw DNA); zlib's dynamic
  // Huffman is the default for all levels.
  if (nowrap && (level == 1 || level == 2) && in != nullptr &&
      fast_deflate_enabled()) {
    int r = fast_deflate_fixed(in, in_len, out, out_cap, level);
    if (r >= 0) return r;
    // fall through to zlib when the fixed-Huffman stream would not fit
  }
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  int window = nowrap ? -MAX_WBITS : MAX_WBITS;
  if (deflateInit2(&zs, level, Z_DEFLATED, window, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return -1;
  zs.next_in = const_cast<Bytef*>(in);
  zs.avail_in = (uInt)in_len;
  zs.next_out = out;
  zs.avail_out = (uInt)out_cap;
  int ret = deflate(&zs, Z_FINISH);
  int written = (int)(out_cap - zs.avail_out);
  deflateEnd(&zs);
  if (ret != Z_STREAM_END) return -1;  // output buffer too small or error
  return written;
}

int do_inflate(const uint8_t* in, int in_len, uint8_t* out, int out_cap,
               int nowrap) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  int window = nowrap ? -MAX_WBITS : MAX_WBITS;
  if (inflateInit2(&zs, window) != Z_OK) return -1;
  zs.next_in = const_cast<Bytef*>(in);
  zs.avail_in = (uInt)in_len;
  zs.next_out = out;
  zs.avail_out = (uInt)out_cap;
  int ret = inflate(&zs, Z_FINISH);
  int written = (int)(out_cap - zs.avail_out);
  inflateEnd(&zs);
  if (ret != Z_STREAM_END) return -1;
  return written;
}

}  // namespace

extern "C" {

// Single-shot block compress; returns bytes written or -1.
int gkl_deflate(const uint8_t* in, int in_len, uint8_t* out, int out_cap,
                int level, int nowrap) {
  return do_deflate(in, in_len, out, out_cap, level, nowrap);
}

// Single-shot block decompress (raw DEFLATE when nowrap, zlib otherwise).
int gkl_inflate(const uint8_t* in, int in_len, uint8_t* out, int out_cap,
                int nowrap) {
  return do_inflate(in, in_len, out, out_cap, nowrap);
}

// Upper bound on the compressed size of a block (covers both the zlib path
// and the fixed-Huffman fast path, whose worst case is 9 bits/byte).
int gkl_deflate_bound(int in_len) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  deflateInit2(&zs, 6, Z_DEFLATED, -MAX_WBITS, 8, Z_DEFAULT_STRATEGY);
  int b = (int)deflateBound(&zs, (uLong)in_len);
  deflateEnd(&zs);
  int fixed_bound = in_len + (in_len >> 3) + 64;
  return (b > fixed_bound ? b : fixed_bound) + 32;
}

uint32_t gkl_crc32(uint32_t crc, const uint8_t* data, int len) {
  return (uint32_t)crc32((uLong)crc, data, (uInt)len);
}

// Parallel batch compress: n blocks at offsets in a packed input buffer.
// Outputs are written at fixed per-block capacity strides; out_lens[i]
// receives the compressed size (or -1 on failure).
void gkl_deflate_batch(const uint8_t* in, const int64_t* in_offsets,
                       const int32_t* in_lens, int n, uint8_t* out,
                       int64_t out_stride, int32_t* out_lens, int level,
                       int nowrap, int n_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      out_lens[i] = do_deflate(in + in_offsets[i], in_lens[i],
                               out + (int64_t)i * out_stride, (int)out_stride,
                               level, nowrap);
    }
  };
  if (n_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Parallel batch decompress with the same packing scheme.
void gkl_inflate_batch(const uint8_t* in, const int64_t* in_offsets,
                       const int32_t* in_lens, int n, uint8_t* out,
                       int64_t out_stride, int32_t* out_lens, int nowrap,
                       int n_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      out_lens[i] = do_inflate(in + in_offsets[i], in_lens[i],
                               out + (int64_t)i * out_stride, (int)out_stride,
                               nowrap);
    }
  };
  if (n_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
