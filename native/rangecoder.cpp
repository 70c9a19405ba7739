// Adaptive range coder for VQ code streams.
//
// Entropy-codes the codec's (B, S, G, T) code tensors below their nominal
// log2(K) bits/symbol by exploiting non-uniform codebook usage (the same
// statistic the EntropyCounter utilization metric measures — utilization
// < 1.0 means the range coder wins). One adaptive frequency model per
// (stream, group) context, Fenwick-tree cumulative counts, byte-oriented
// Subbotin-style renormalization. Encoder and decoder update models
// identically, so no tables are stored.
//
// C ABI for ctypes (esc_tpu/cli/entropy.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kTop = 1u << 24;
constexpr uint32_t kBot = 1u << 16;
constexpr uint32_t kMaxTotal = 1u << 16;

struct Fenwick {
  // counts over K symbols with prefix-sum queries
  std::vector<uint32_t> tree;
  uint32_t k = 0, total = 0;

  void init(uint32_t K) {
    k = K;
    tree.assign(K + 1, 0);
    for (uint32_t s = 0; s < K; ++s) add(s, 1);
  }
  void add(uint32_t i, int32_t delta) {
    total += delta;
    for (uint32_t x = i + 1; x <= k; x += x & (~x + 1)) tree[x] += delta;
  }
  uint32_t prefix(uint32_t i) const {  // sum of counts [0, i)
    uint32_t s = 0;
    for (uint32_t x = i; x > 0; x -= x & (~x + 1)) s += tree[x];
    return s;
  }
  uint32_t count(uint32_t i) const { return prefix(i + 1) - prefix(i); }
  // find symbol with prefix(sym) <= f < prefix(sym+1)
  uint32_t find(uint32_t f) const {
    uint32_t pos = 0, rem = f;
    uint32_t mask = 1;
    while ((mask << 1) <= k) mask <<= 1;
    for (; mask > 0; mask >>= 1) {
      uint32_t next = pos + mask;
      if (next <= k && tree[next] <= rem) {
        rem -= tree[next];
        pos = next;
      }
    }
    return pos;  // symbols are 0-based; pos == number of tree slots passed
  }
  void update(uint32_t sym) {
    add(sym, 32);
    if (total >= kMaxTotal) rescale();
  }
  void rescale() {
    std::vector<uint32_t> counts(k);
    for (uint32_t s = 0; s < k; ++s) counts[s] = count(s);
    tree.assign(k + 1, 0);
    total = 0;
    for (uint32_t s = 0; s < k; ++s)
      add(s, (counts[s] + 1) / 2 > 0 ? (counts[s] + 1) / 2 : 1);
  }
};

struct Encoder {
  std::vector<uint8_t> out;
  uint32_t low = 0, range = 0xFFFFFFFFu;

  void encode(uint32_t cum, uint32_t cnt, uint32_t tot) {
    range /= tot;
    low += cum * range;
    range *= cnt;
    normalize();
  }
  void normalize() {
    while ((low ^ (low + range)) < kTop ||
           (range < kBot && ((range = -low & (kBot - 1)), true))) {
      out.push_back(low >> 24);
      low <<= 8;
      range <<= 8;
    }
  }
  void flush() {
    for (int i = 0; i < 4; ++i) {
      out.push_back(low >> 24);
      low <<= 8;
    }
  }
};

struct Decoder {
  const uint8_t* in;
  size_t len, pos = 0;
  uint32_t low = 0, range = 0xFFFFFFFFu, code = 0;

  void init(const uint8_t* data, size_t n) {
    in = data;
    len = n;
    for (int i = 0; i < 4; ++i) code = (code << 8) | next();
  }
  uint8_t next() { return pos < len ? in[pos++] : 0; }
  uint32_t decode_freq(uint32_t tot) {
    range /= tot;
    uint32_t f = (code - low) / range;
    // clamp: corrupt/truncated input could yield f >= tot, which would
    // send Fenwick::find past the last symbol (OOB tree read)
    return f < tot ? f : tot - 1;
  }
  void decode_update(uint32_t cum, uint32_t cnt) {
    low += cum * range;
    range *= cnt;
    while ((low ^ (low + range)) < kTop ||
           (range < kBot && ((range = -low & (kBot - 1)), true))) {
      code = (code << 8) | next();
      low <<= 8;
      range <<= 8;
    }
  }
};

}  // namespace

extern "C" {

// Encode n symbols (int32, each < K) with per-symbol context ids
// (int32, each < n_ctx). Returns bytes written into out (capacity
// out_cap), or -1 if out of space.
long esc_rc_encode(const int32_t* symbols, const int32_t* ctx, long n,
                   int K, int n_ctx, uint8_t* out, long out_cap) {
  std::vector<Fenwick> models(n_ctx);
  for (auto& m : models) m.init(K);
  Encoder enc;
  enc.out.reserve(n * 2);
  for (long i = 0; i < n; ++i) {
    Fenwick& m = models[ctx[i]];
    uint32_t s = symbols[i];
    enc.encode(m.prefix(s), m.count(s), m.total);
    m.update(s);
  }
  enc.flush();
  if ((long)enc.out.size() > out_cap) return -1;
  std::memcpy(out, enc.out.data(), enc.out.size());
  return (long)enc.out.size();
}

// Decode n symbols written by esc_rc_encode with the same ctx sequence.
long esc_rc_decode(const uint8_t* data, long data_len, const int32_t* ctx,
                   long n, int K, int n_ctx, int32_t* out) {
  std::vector<Fenwick> models(n_ctx);
  for (auto& m : models) m.init(K);
  Decoder dec;
  dec.init(data, (size_t)data_len);
  for (long i = 0; i < n; ++i) {
    Fenwick& m = models[ctx[i]];
    uint32_t f = dec.decode_freq(m.total);
    uint32_t s = m.find(f);
    dec.decode_update(m.prefix(s), m.count(s));
    out[i] = (int32_t)s;
    m.update(s);
  }
  return n;
}

}  // extern "C"
