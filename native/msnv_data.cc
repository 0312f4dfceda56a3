// msnv_data: native data-path kernels for the msnv_tpu corpus pipeline.
//
// The reference's corpus build is dominated by np.loadtxt over thousands of
// Ahocoder text files (ref dataset.py:90-104) plus librosa WAV decodes
// (ref dataset.py:86). These C++ equivalents are 10-50x faster and are
// loaded via ctypes (no pybind11 in the image). Pure-python fallbacks
// remain in msnv_tpu/data — behavior is bit-identical (tests compare both).
//
// Build: make -C native   (produces native/libmsnv_data.so)

#include <cctype>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// memory
// ---------------------------------------------------------------------------

void msnv_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// WAV decode (PCM16 / PCM32 / float32, mono-downmix) -> float32 in [-1, 1)
// Matches msnv_tpu.data.wavio.read_wav.
// Returns 0 on success; fills *out (malloc'd), *n_samples, *sample_rate.
// ---------------------------------------------------------------------------

int msnv_read_wav(const char* path, float** out, int64_t* n_samples,
                  int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) != 0 ||
      memcmp(hdr + 8, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }
  uint16_t audio_format = 0, n_channels = 0, bits = 0;
  uint32_t rate = 0;
  unsigned char* data = nullptr;
  uint32_t data_size = 0;
  unsigned char chunk_hdr[8];
  while (fread(chunk_hdr, 1, 8, f) == 8) {
    uint32_t csize;
    memcpy(&csize, chunk_hdr + 4, 4);
    if (memcmp(chunk_hdr, "fmt ", 4) == 0) {
      unsigned char fmt[16];
      if (csize < 16 || fread(fmt, 1, 16, f) != 16) { fclose(f); return -3; }
      memcpy(&audio_format, fmt, 2);
      memcpy(&n_channels, fmt + 2, 2);
      memcpy(&rate, fmt + 4, 4);
      memcpy(&bits, fmt + 14, 2);
      if (csize > 16) fseek(f, csize - 16, SEEK_CUR);
    } else if (memcmp(chunk_hdr, "data", 4) == 0) {
      data = (unsigned char*)malloc(csize);
      if (!data || fread(data, 1, csize, f) != csize) {
        free(data);
        fclose(f);
        return -4;
      }
      data_size = csize;
    } else {
      fseek(f, csize, SEEK_CUR);
    }
    if (csize % 2) fseek(f, 1, SEEK_CUR);  // word alignment
  }
  fclose(f);
  if (!data || n_channels == 0) { free(data); return -5; }

  int64_t frames;
  float* buf;
  if (audio_format == 1 && bits == 16) {
    frames = data_size / (2 * n_channels);
    buf = (float*)malloc(sizeof(float) * frames);
    const int16_t* s = (const int16_t*)data;
    for (int64_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < n_channels; c++)
        acc += (float)s[i * n_channels + c] / 32768.0f;
      buf[i] = acc / n_channels;
    }
  } else if (audio_format == 1 && bits == 32) {
    frames = data_size / (4 * n_channels);
    buf = (float*)malloc(sizeof(float) * frames);
    const int32_t* s = (const int32_t*)data;
    for (int64_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < n_channels; c++)
        acc += (float)((double)s[i * n_channels + c] / 2147483648.0);
      buf[i] = acc / n_channels;
    }
  } else if (audio_format == 3 && bits == 32) {
    frames = data_size / (4 * n_channels);
    buf = (float*)malloc(sizeof(float) * frames);
    const float* s = (const float*)data;
    for (int64_t i = 0; i < frames; i++) {
      float acc = 0.f;
      for (int c = 0; c < n_channels; c++) acc += s[i * n_channels + c];
      buf[i] = acc / n_channels;
    }
  } else {
    free(data);
    return -6;
  }
  free(data);
  *out = buf;
  *n_samples = frames;
  *sample_rate = (int32_t)rate;
  return 0;
}

// ---------------------------------------------------------------------------
// Whitespace-separated float text parser (np.loadtxt equivalent for
// Ahocoder .cc/.lf0/.gv files). Also reports the column count of the first
// row so callers can reshape. Returns 0 on success.
// ---------------------------------------------------------------------------

int msnv_parse_floats(const char* path, double** out, int64_t* n_values,
                      int64_t* n_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* text = (char*)malloc(size + 1);
  if (!text || fread(text, 1, size, f) != (size_t)size) {
    free(text);
    fclose(f);
    return -2;
  }
  fclose(f);
  text[size] = '\0';

  int64_t cap = 4096, n = 0;
  double* vals = (double*)malloc(sizeof(double) * cap);
  int64_t first_row_cols = 0;
  bool counting_first_row = true;

  const char* p = text;
  while (*p) {
    while (*p && std::isspace((unsigned char)*p)) {
      if (*p == '\n' && first_row_cols > 0) counting_first_row = false;
      p++;
    }
    if (!*p) break;
    char* end;
    errno = 0;
    double v = strtod(p, &end);
    if (end == p) { free(vals); free(text); return -3; }
    if (n == cap) {
      cap *= 2;
      double* grown = (double*)realloc(vals, sizeof(double) * cap);
      if (!grown) { free(vals); free(text); return -2; }
      vals = grown;
    }
    vals[n++] = v;
    if (counting_first_row) first_row_cols++;
    p = end;
  }
  free(text);
  *out = vals;
  *n_values = n;
  *n_cols = first_row_cols > 0 ? first_row_cols : 1;
  return 0;
}

// ---------------------------------------------------------------------------
// mu-law quantization of a float stream -> int32 levels.
// Bit-identical to msnv_tpu.ops.quantize.uquantize (f32 math, floor).
// ---------------------------------------------------------------------------

static const float kMu = 255.0f;
static const float kLogMu1 = 5.5451774444795623f;  // log(1+MU)

void msnv_uquantize(const float* x, int64_t n, int32_t q_levels,
                    int32_t* out) {
  const float scale = (float)((double)q_levels - 1e-6);
  for (int64_t i = 0; i < n; i++) {
    float v = x[i];
    float sign = (v > 0.f) ? 1.f : ((v < 0.f) ? -1.f : 0.f);
    float y = sign * log1pf(kMu * fabsf(v)) / kLogMu1;
    out[i] = (int32_t)floorf(0.5f * (y + 1.0f) * scale);
  }
}

}  // extern "C"
