// rANS range coder for the hyperprior codec.
//
// The reference repo has NO entropy coder at all — its "bpp" is an
// analytic likelihood estimate (epsilonparam/modules/compress_modules.py:84-98)
// and compressai is pinned but never imported. This file supplies the real
// bitstream: a 64-bit-state rANS with 32-bit renormalization and 16-bit
// quantized probabilities, driven by per-symbol CDF table indices
// (channel id for the factorized hyper-prior, scale-bin id for the
// Gaussian conditional). Out-of-range symbols use an escape slot followed
// by a raw 32-bit value coded as two uniform 16-bit halves, so coding is
// lossless for any integer latent.
//
// Build: g++ -O3 -shared -fPIC -o librans.so rans.cpp  (see build.py)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint64_t kRansL = 1ull << 31;  // lower bound of the state interval

struct RansEncoder {
  uint64_t state = kRansL;
  std::vector<uint32_t> words;  // emitted 32-bit words (reversed at flush)

  inline void put(uint32_t start, uint32_t freq) {
    // renormalize so the state stays in [L, (L>>prob_bits)<<32 * freq)
    const uint64_t x_max = ((kRansL >> kProbBits) << 32) * freq;
    while (state >= x_max) {
      words.push_back(static_cast<uint32_t>(state));
      state >>= 32;
    }
    state = ((state / freq) << kProbBits) + (state % freq) + start;
  }

  // uniform 16-bit symbol (freq = 1 in a 2^16 table)
  inline void put_uniform16(uint32_t value) { put(value, 1); }

  size_t flush(uint8_t* out, size_t capacity) const {
    // decoder walks backward from the state, so it sees the most
    // recently emitted word first — store words in emission order,
    // then the final state (8 bytes) at the end.
    const size_t nbytes = words.size() * 4 + 8;
    if (nbytes > capacity) return 0;
    if (!words.empty()) std::memcpy(out, words.data(), words.size() * 4);
    std::memcpy(out + words.size() * 4, &state, 8);
    return nbytes;
  }
};

struct RansDecoder {
  uint64_t state = 0;
  const uint8_t* ptr;    // walks backward through the word section
  const uint8_t* begin;  // first byte of the word section

  void init(const uint8_t* bytes, size_t nbytes) {
    begin = bytes;
    ptr = bytes + nbytes - 8;
    std::memcpy(&state, ptr, 8);
  }

  inline uint32_t peek() const { return static_cast<uint32_t>(state & (kProbScale - 1)); }

  inline void advance(uint32_t start, uint32_t freq) {
    state = freq * (state >> kProbBits) + (state & (kProbScale - 1)) - start;
    while (state < kRansL && ptr > begin) {
      ptr -= 4;
      uint32_t w;
      std::memcpy(&w, ptr, 4);
      state = (state << 32) | w;
    }
  }

  inline uint32_t get_uniform16() {
    const uint32_t v = peek();
    advance(v, 1);
    return v;
  }
};

// Locate symbol s such that cdf[s] <= cum < cdf[s+1] (binary search).
inline int32_t find_symbol(const uint32_t* cdf, int32_t size, uint32_t cum) {
  int32_t lo = 0, hi = size - 1;  // cdf has size+1 entries, symbols 0..size-1
  while (lo < hi) {
    const int32_t mid = (lo + hi + 1) >> 1;
    if (cdf[mid] <= cum)
      lo = mid;
    else
      hi = mid - 1;
  }
  return lo;
}

}  // namespace

extern "C" {

// Encode n symbols. cdfs: ncdfs rows of (max_len+1) uint32 each, row i
// valid up to cdf_sizes[i]+1 entries (cdf_sizes[i] symbol slots, the last
// one being the escape slot). offsets[i]: symbol value of slot 0.
// Returns byte count written, or -1 on overflow.
int64_t rans_encode(const int32_t* symbols, const int32_t* indexes, int64_t n,
                    const uint32_t* cdfs, const int32_t* cdf_sizes,
                    const int32_t* offsets, int32_t max_len_p1, uint8_t* out,
                    int64_t capacity) {
  RansEncoder enc;
  enc.words.reserve(static_cast<size_t>(n) / 2 + 16);
  std::vector<uint32_t> escapes;  // raw values for escaped symbols (in order)

  // rANS encodes in reverse; escapes must decode in forward order, so
  // first pass forward to collect escapes, then encode everything reversed.
  std::vector<int32_t> slot(n);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t size = cdf_sizes[idx];
    const int32_t esc = size - 1;  // escape slot id
    int32_t s = symbols[i] - offsets[idx];
    if (s < 0 || s >= esc) {
      slot[i] = esc;
      // raw value biased into uint32
      escapes.push_back(static_cast<uint32_t>(symbols[i] - offsets[idx] + (1 << 30)));
    } else {
      slot[i] = s;
    }
  }

  size_t esc_i = escapes.size();
  for (int64_t i = n; i-- > 0;) {
    const int32_t idx = indexes[i];
    const uint32_t* cdf = cdfs + static_cast<int64_t>(idx) * max_len_p1;
    const int32_t s = slot[i];
    if (s == cdf_sizes[idx] - 1) {
      // escape: raw 32-bit value goes "after" the escape marker in decode
      // order -> encode it first (reverse order)
      const uint32_t v = escapes[--esc_i];
      enc.put_uniform16(v & 0xffffu);
      enc.put_uniform16(v >> 16);
    }
    enc.put(cdf[s], cdf[s + 1] - cdf[s]);
  }
  const size_t written = enc.flush(out, static_cast<size_t>(capacity));
  return written == 0 ? -1 : static_cast<int64_t>(written);
}

// Decode n symbols given the same tables/indexes used at encode time.
int64_t rans_decode(const uint8_t* bytes, int64_t nbytes, const int32_t* indexes,
                    int64_t n, const uint32_t* cdfs, const int32_t* cdf_sizes,
                    const int32_t* offsets, int32_t max_len_p1,
                    int32_t* out_symbols) {
  RansDecoder dec;
  dec.init(bytes, static_cast<size_t>(nbytes));
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const uint32_t* cdf = cdfs + static_cast<int64_t>(idx) * max_len_p1;
    const int32_t size = cdf_sizes[idx];
    const uint32_t cum = dec.peek();
    const int32_t s = find_symbol(cdf, size, cum);
    dec.advance(cdf[s], cdf[s + 1] - cdf[s]);
    if (s == size - 1) {
      const uint32_t hi = dec.get_uniform16();
      const uint32_t lo = dec.get_uniform16();
      const uint32_t v = (hi << 16) | lo;
      out_symbols[i] = static_cast<int32_t>(v) - (1 << 30) + offsets[idx];
    } else {
      out_symbols[i] = s + offsets[idx];
    }
  }
  return n;
}

}  // extern "C"
