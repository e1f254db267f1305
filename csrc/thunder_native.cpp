// Native host runtime for thunder_tpu.
//
// Plays the role the reference outsources to torchaudio/libsox + C++ deps
// (SURVEY.md §2b): audio decode, resampling, and the text-metric hot loops.
// Exposed through a plain C ABI consumed via ctypes (thunder_tpu/native.py).
//
// Build: make -C csrc  (or thunder_tpu.native builds it on first import)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

struct TnAudio {
  float* data;        // planar (channels x frames)
  int32_t channels;
  int64_t frames;
  int32_t sample_rate;
};

static int read_exact(FILE* f, void* buf, size_t n) {
  return fread(buf, 1, n, f) == n ? 0 : -1;
}

// Decodes a RIFF/WAVE file (PCM 8/16/24/32-bit and IEEE float32/64).
// Returns 0 on success; caller frees with tn_free_audio.
int tn_load_wav(const char* path, TnAudio* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[12];
  if (read_exact(f, hdr, 12) || memcmp(hdr, "RIFF", 4) || memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool have_fmt = false;
  std::vector<uint8_t> raw;
  while (true) {
    uint8_t chunk[8];
    if (read_exact(f, chunk, 8)) break;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (!memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> fbuf(size);
      if (read_exact(f, fbuf.data(), size)) { fclose(f); return -3; }
      memcpy(&fmt, fbuf.data(), 2);
      memcpy(&channels, fbuf.data() + 2, 2);
      memcpy(&rate, fbuf.data() + 4, 4);
      memcpy(&bits, fbuf.data() + 14, 2);
      if (fmt == 0xFFFE && size >= 26) memcpy(&fmt, fbuf.data() + 24, 2);  // extensible
      have_fmt = true;
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (!memcmp(chunk, "data", 4)) {
      if (!have_fmt) { fclose(f); return -4; }
      raw.resize(size);
      if (read_exact(f, raw.data(), size)) { fclose(f); return -5; }
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!have_fmt || raw.empty() || channels == 0 || bits == 0) return -6;

  const int bytes = bits / 8;
  const int64_t frames = (int64_t)raw.size() / (channels * bytes);
  float* data = (float*)malloc(sizeof(float) * frames * channels);
  if (!data) return -7;

  for (int64_t i = 0; i < frames; ++i) {
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = raw.data() + (i * channels + c) * bytes;
      float v = 0.f;
      if (fmt == 3) {  // IEEE float
        if (bits == 32) { float t; memcpy(&t, p, 4); v = t; }
        else if (bits == 64) { double t; memcpy(&t, p, 8); v = (float)t; }
      } else {
        if (bits == 16) { int16_t t; memcpy(&t, p, 2); v = t / 32768.f; }
        else if (bits == 32) { int32_t t; memcpy(&t, p, 4); v = t / 2147483648.f; }
        else if (bits == 8) { v = ((int)p[0] - 128) / 128.f; }
        else if (bits == 24) {
          int32_t t = p[0] | (p[1] << 8) | (p[2] << 16);
          if (t >= (1 << 23)) t -= (1 << 24);
          v = t / 8388608.f;
        }
      }
      data[(int64_t)c * frames + i] = v;  // planar
    }
  }
  out->data = data;
  out->channels = channels;
  out->frames = frames;
  out->sample_rate = (int32_t)rate;
  return 0;
}

void tn_free_audio(TnAudio* a) {
  if (a && a->data) { free(a->data); a->data = nullptr; }
}

// Header-only info: frames + rate + channels (for duration bucketing).
int tn_wav_info(const char* path, int64_t* frames, int32_t* rate, int32_t* channels, int32_t* bits) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[12];
  if (read_exact(f, hdr, 12) || memcmp(hdr, "RIFF", 4) || memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f); return -2;
  }
  uint16_t ch = 0, b = 0;
  uint32_t r = 0;
  bool have_fmt = false;
  while (true) {
    uint8_t chunk[8];
    if (read_exact(f, chunk, 8)) { fclose(f); return -3; }
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (!memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> fbuf(size);
      if (read_exact(f, fbuf.data(), size)) { fclose(f); return -3; }
      memcpy(&ch, fbuf.data() + 2, 2);
      memcpy(&r, fbuf.data() + 4, 4);
      memcpy(&b, fbuf.data() + 14, 2);
      have_fmt = true;
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (!memcmp(chunk, "data", 4)) {
      fclose(f);
      if (!have_fmt || ch == 0 || b == 0) return -4;
      *frames = (int64_t)size / (ch * (b / 8));
      *rate = (int32_t)r;
      *channels = ch;
      *bits = b;
      return 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler
// ---------------------------------------------------------------------------

// y has ceil(n_in * up / down) samples; filter: Hann-windowed sinc with
// `zeros` zero crossings per side at the lower of the two Nyquists.
int tn_resample(const float* x, int64_t n_in, float* y, int64_t n_out,
                int32_t up, int32_t down, int32_t zeros) {
  if (up <= 0 || down <= 0) return -1;
  const double cutoff = 0.5 / std::max(up, down);   // in units of up-rate
  const int64_t half = (int64_t)zeros * std::max(up, down);
  const double norm = 2.0 * cutoff * up;
  for (int64_t j = 0; j < n_out; ++j) {
    // output j corresponds to up-rate index j*down; convolve with sinc taps
    const int64_t center = j * down;
    double acc = 0.0;
    // input samples map to up-rate indices i*up
    int64_t i_lo = (center - half + up - 1) / up;
    int64_t i_hi = (center + half) / up;
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n_in) i_hi = n_in - 1;
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      const double t = (double)(center - i * up);  // up-rate offset
      const double xs = 2.0 * M_PI * cutoff * t;
      double s = (t == 0.0) ? 1.0 : std::sin(xs) / xs;
      const double w = 0.5 * (1.0 + std::cos(M_PI * t / half));  // Hann
      acc += (double)x[i] * s * w;
    }
    y[j] = (float)(acc * norm);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Edit distance (Levenshtein) over int32 token sequences
// ---------------------------------------------------------------------------

int64_t tn_edit_distance(const int32_t* a, int64_t la, const int32_t* b, int64_t lb) {
  if (la < lb) { std::swap(a, b); std::swap(la, lb); }
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const int32_t ca = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1]);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// ---------------------------------------------------------------------------
// CTC greedy collapse: drop consecutive repeats; returns new length
// ---------------------------------------------------------------------------

int64_t tn_ctc_collapse(const int32_t* ids, int64_t n, int32_t* out) {
  if (n == 0) return 0;
  int64_t m = 0;
  int32_t prev = ids[0] - 1;  // != ids[0]
  for (int64_t i = 0; i < n; ++i) {
    if (ids[i] != prev) out[m++] = ids[i];
    prev = ids[i];
  }
  return m;
}

}  // extern "C"
