// Native WAV batch loader for the esc_tpu data pipeline.
//
// The reference delegates decoding to torchaudio's C++ backend
// (scripts/utils.py:39); here a small C++ library does the same job for
// the TPU input pipeline: RIFF/WAVE parsing (PCM16/24/32 + float32),
// first-channel extraction, float32 normalization, and a thread-pool
// batch API so host-side decode overlaps device steps.
//
// Exposed via a plain C ABI consumed from Python with ctypes
// (esc_tpu/native/__init__.py). Build: `python native/build.py`.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // first channel, [-1, 1]
  int sample_rate = 0;
  bool ok = false;
  std::string error;
};

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
uint16_t rd_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

WavData load_wav_file(const std::string& path) {
  WavData out;
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    out.error = "cannot open " + path;
    return out;
  }
  const std::streamsize size = f.tellg();
  f.seekg(0);
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (!f.read(reinterpret_cast<char*>(buf.data()), size)) {
    out.error = "short read " + path;
    return out;
  }
  if (size < 44 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0) {
    out.error = "not a RIFF/WAVE file: " + path;
    return out;
  }

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      sample_rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && chunk_len >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fmt = rd_u16(body + 24);
      }
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = chunk_len;
      if (pos + 8 + data_len > buf.size()) {
        data_len = static_cast<uint32_t>(buf.size() - pos - 8);
      }
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are 2-byte aligned
  }
  if (!data || channels == 0) {
    out.error = "missing fmt/data chunk: " + path;
    return out;
  }
  if (bits < 8) {  // malformed fmt chunk would divide by zero below
    out.error = "bad bit depth: " + path;
    return out;
  }

  const uint32_t bytes_per = bits / 8;
  const uint32_t frames = data_len / (bytes_per * channels);
  out.samples.resize(frames);
  if (fmt == 1 && bits == 16) {
    for (uint32_t i = 0; i < frames; ++i) {
      int16_t v;
      std::memcpy(&v, data + (size_t)i * channels * 2, 2);
      out.samples[i] = static_cast<float>(v) / 32768.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    for (uint32_t i = 0; i < frames; ++i) {
      int32_t v;
      std::memcpy(&v, data + (size_t)i * channels * 4, 4);
      out.samples[i] = static_cast<float>(v) / 2147483648.0f;
    }
  } else if (fmt == 1 && bits == 24) {
    for (uint32_t i = 0; i < frames; ++i) {
      const uint8_t* p = data + (size_t)i * channels * 3;
      int32_t v = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
      out.samples[i] = static_cast<float>(v >> 8) / 8388608.0f;
    }
  } else if (fmt == 3 && bits == 32) {
    for (uint32_t i = 0; i < frames; ++i) {
      float v;
      std::memcpy(&v, data + (size_t)i * channels * 4, 4);
      out.samples[i] = v;
    }
  } else {
    out.error = "unsupported wav format " + std::to_string(fmt) + "/" +
                std::to_string(bits) + "bit: " + path;
    out.samples.clear();
    return out;
  }
  out.sample_rate = static_cast<int>(sample_rate);
  out.ok = true;
  return out;
}

}  // namespace

extern "C" {

// Single-file API: returns number of samples written (<= max_len), or
// -1 on error. `sr_out` receives the sample rate.
long esc_load_wav(const char* path, float* out, long max_len, int* sr_out) {
  WavData w = load_wav_file(path);
  if (!w.ok) return -1;
  long n = static_cast<long>(w.samples.size());
  if (n > max_len) n = max_len;
  std::memcpy(out, w.samples.data(), sizeof(float) * n);
  if (sr_out) *sr_out = w.sample_rate;
  return n;
}

// Batch API: decode `count` files on `num_threads` threads into a dense
// (count, max_len) row-major buffer, zero-padded; lengths[i] receives
// each true length (or -1 on per-file error). Returns 0 on success.
int esc_load_wav_batch(const char** paths, long count, float* out,
                       long max_len, long* lengths, int num_threads) {
  std::atomic<long> next(0);
  auto worker = [&]() {
    while (true) {
      long i = next.fetch_add(1);
      if (i >= count) break;
      WavData w = load_wav_file(paths[i]);
      float* row = out + (size_t)i * max_len;
      if (!w.ok) {
        lengths[i] = -1;
        std::memset(row, 0, sizeof(float) * max_len);
        continue;
      }
      long n = static_cast<long>(w.samples.size());
      if (n > max_len) n = max_len;
      std::memcpy(row, w.samples.data(), sizeof(float) * n);
      if (n < max_len) std::memset(row + n, 0, sizeof(float) * (max_len - n));
      lengths[i] = n;
    }
  };
  int nt = num_threads > 0 ? num_threads : 1;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
