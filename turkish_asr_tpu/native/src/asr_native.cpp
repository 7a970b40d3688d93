// Native host-side hot ops for turkish_asr_tpu.
//
// The reference offloads these to torchaudio's C++ kernels (wav decode,
// resample) and to C++ packages (kenlm, flashlight); jiwer's edit distance
// is Python. Here the host-side hot path is native C++ exposed over a C ABI
// and bound via ctypes (no pybind11 dependency):
//
//   - WAV decode (PCM 8/16/24/32 + IEEE float) -> float32 [-1, 1]
//   - windowed-sinc polyphase resampling (same math as audio/wavio.py)
//   - Levenshtein distance (token sequences) for WER/CER at corpus scale
//
// Build: g++ -O3 -march=native -shared -fPIC asr_native.cpp -o libasr_native.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Parses the RIFF container. Returns 0 on success.
// Pass out=nullptr to query sizes (n_samples per channel, channels, rate).
int wav_decode(const uint8_t* data, int64_t n_bytes,
               float* out, int64_t* n_samples, int* n_channels,
               int* sample_rate) {
  if (n_bytes < 12 || memcmp(data, "RIFF", 4) != 0 ||
      memcmp(data + 8, "WAVE", 4) != 0)
    return -1;

  int64_t pos = 12;
  int fmt_code = -1, channels = 0, bits = 0, rate = 0;
  const uint8_t* pcm = nullptr;
  int64_t pcm_bytes = 0;

  while (pos + 8 <= n_bytes) {
    uint32_t chunk_size;
    memcpy(&chunk_size, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + (int64_t)chunk_size > n_bytes) {
      chunk_size = (uint32_t)(n_bytes - pos - 8);  // tolerate truncation
    }
    if (memcmp(data + pos, "fmt ", 4) == 0 && chunk_size >= 16) {
      uint16_t code16, ch16, bits16;
      uint32_t rate32;
      memcpy(&code16, body, 2);
      memcpy(&ch16, body + 2, 2);
      memcpy(&rate32, body + 4, 4);
      memcpy(&bits16, body + 14, 2);
      fmt_code = code16;
      channels = ch16;
      rate = (int)rate32;
      bits = bits16;
      if (fmt_code == 0xFFFE && chunk_size >= 40) {
        memcpy(&code16, body + 24, 2);
        fmt_code = code16;
      }
    } else if (memcmp(data + pos, "data", 4) == 0) {
      pcm = body;
      pcm_bytes = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  if (fmt_code < 0 || pcm == nullptr || channels <= 0) return -2;

  int64_t frames;
  if (fmt_code == 1) {  // PCM
    int bytes_per = bits / 8;
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return -3;
    frames = pcm_bytes / (bytes_per * channels);
  } else if (fmt_code == 3) {  // IEEE float
    int bytes_per = bits / 8;
    if (bits != 32 && bits != 64) return -3;
    frames = pcm_bytes / (bytes_per * channels);
  } else {
    return -4;
  }

  *n_samples = frames;
  *n_channels = channels;
  *sample_rate = rate;
  if (out == nullptr) return 0;  // size query

  // Deinterleave to (channels, frames), scaled to [-1, 1].
  for (int64_t f = 0; f < frames; ++f) {
    for (int c = 0; c < channels; ++c) {
      int64_t i = f * channels + c;
      float v = 0.f;
      if (fmt_code == 1) {
        if (bits == 8) {
          v = ((float)pcm[i] - 128.0f) / 128.0f;
        } else if (bits == 16) {
          int16_t s;
          memcpy(&s, pcm + 2 * i, 2);
          v = (float)s / 32768.0f;
        } else if (bits == 24) {
          int32_t s = pcm[3 * i] | (pcm[3 * i + 1] << 8) |
                      (pcm[3 * i + 2] << 16);
          if (s >= (1 << 23)) s -= (1 << 24);
          v = (float)s / 8388608.0f;
        } else {
          int32_t s;
          memcpy(&s, pcm + 4 * i, 4);
          v = (float)s / 2147483648.0f;
        }
      } else {
        if (bits == 32) {
          float s;
          memcpy(&s, pcm + 4 * i, 4);
          v = s;
        } else {
          double s;
          memcpy(&s, pcm + 8 * i, 8);
          v = (float)s;
        }
      }
      out[(int64_t)c * frames + f] = v;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Windowed-sinc polyphase resampling (matches audio/wavio.py numerics)
// ---------------------------------------------------------------------------

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) { int64_t t = a % b; a = b; b = t; }
  return a;
}

// out must hold ceil(new_freq * n_in / orig_freq) floats (after gcd
// reduction the value is identical). Returns the produced length.
int64_t resample_f32(const float* in, int64_t n_in, float* out,
                     int orig_freq, int new_freq,
                     int lowpass_filter_width, double rolloff) {
  if (orig_freq == new_freq) {
    memcpy(out, in, sizeof(float) * n_in);
    return n_in;
  }
  int64_t g = gcd64(orig_freq, new_freq);
  int64_t o = orig_freq / g, n = new_freq / g;

  double base_freq = (double)std::min(o, n) * rolloff;
  int64_t width = (int64_t)std::ceil(lowpass_filter_width * o / base_freq);
  int64_t K = 2 * width + o;
  double scale = base_freq / (double)o;

  // Kernel bank (n phases x K taps), fp64 accumulation like numpy.
  std::vector<double> kernels((size_t)(n * K));
  for (int64_t ph = 0; ph < n; ++ph) {
    for (int64_t j = 0; j < K; ++j) {
      double idx = (double)(j - width) / (double)o;
      double t = (double)(-ph) / (double)n + idx;
      t *= base_freq;
      t = std::max(-(double)lowpass_filter_width,
                   std::min((double)lowpass_filter_width, t));
      double window = std::cos(t * M_PI / lowpass_filter_width / 2.0);
      window *= window;
      double tp = t * M_PI;
      double sinc = (tp == 0.0) ? 1.0 : std::sin(tp) / tp;
      kernels[(size_t)(ph * K + j)] = sinc * window * scale;
    }
  }

  int64_t target_length =
      (int64_t)std::ceil((double)n * (double)n_in / (double)o);
  // Padded input: width zeros left, width + o zeros right.
  int64_t padded_len = n_in + 2 * width + o;
  std::vector<float> padded((size_t)padded_len, 0.f);
  memcpy(padded.data() + width, in, sizeof(float) * n_in);

  int64_t num_hops = (padded_len - K) / o + 1;
  int64_t produced = 0;
  for (int64_t h = 0; h < num_hops && produced < target_length; ++h) {
    const float* seg = padded.data() + h * o;
    for (int64_t ph = 0; ph < n && produced < target_length; ++ph) {
      const double* kern = kernels.data() + ph * K;
      double acc = 0.0;
      for (int64_t j = 0; j < K; ++j) acc += (double)seg[j] * kern[j];
      out[produced++] = (float)acc;
    }
  }
  return produced;
}

// ---------------------------------------------------------------------------
// Levenshtein distance over int32 token sequences
// ---------------------------------------------------------------------------

int64_t levenshtein_i32(const int32_t* a, int64_t na,
                        const int32_t* b, int64_t nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int64_t> prev(nb + 1), curr(nb + 1);
  for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= na; ++i) {
    curr[0] = i;
    int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= nb; ++j) {
      int64_t cost = (ai == b[j - 1]) ? 0 : 1;
      curr[j] = std::min({prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, curr);
  }
  return prev[nb];
}

}  // extern "C"
