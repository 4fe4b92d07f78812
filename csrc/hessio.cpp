// hessio: native I/O helpers for hessgpu_tpu (ctypes-loaded).
//
// Native counterparts of the reference's host-side I/O (DevIL decode +
// SaveSIFT serialization, GLTexImage.cpp:1117-1220 / SiftPyramid.cpp:357-571):
//   * pnm decode (P2/P3/P5/P6) with RGB->luminance conversion
//   * .sift text writer (the reference's default interchange format) -
//     the Python writer loops per keypoint; this streams the whole table.
//
// Build: make -C csrc (produces build/libhessio.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Decode a PGM/PPM file to 8-bit grayscale. Returns 0 on success.
// On success *out is malloc'd (caller frees via hessio_free), *w/*h set.
int hessio_decode_pnm_gray(const char* path, uint8_t** out, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  auto skip_ws = [&]() {
    int c;
    while ((c = std::fgetc(f)) != EOF) {
      if (c == '#') {
        while ((c = std::fgetc(f)) != EOF && c != '\n') {
        }
      } else if (!std::isspace(c)) {
        std::ungetc(c, f);
        return;
      }
    }
  };
  auto read_int = [&]() -> long {
    skip_ws();
    long v = 0;
    int c;
    bool any = false;
    while ((c = std::fgetc(f)) != EOF && std::isdigit(c)) {
      v = v * 10 + (c - '0');
      any = true;
    }
    if (c != EOF) std::ungetc(c, f);
    return any ? v : -1;
  };

  char magic[3] = {0, 0, 0};
  if (std::fread(magic, 1, 2, f) != 2 || magic[0] != 'P') {
    std::fclose(f);
    return -2;
  }
  int kind = magic[1] - '0';
  if (kind != 2 && kind != 3 && kind != 5 && kind != 6) {
    std::fclose(f);
    return -2;
  }
  long W = read_int(), H = read_int(), maxv = read_int();
  if (W <= 0 || H <= 0 || maxv <= 0) {
    std::fclose(f);
    return -3;
  }
  const int channels = (kind == 3 || kind == 6) ? 3 : 1;
  const size_t count = (size_t)W * H * channels;
  std::vector<uint32_t> vals(count);

  if (kind >= 5) {
    std::fgetc(f);  // single whitespace after maxval
    if (maxv > 255) {
      std::vector<uint16_t> raw(count);
      if (std::fread(raw.data(), 2, count, f) != count) {
        std::fclose(f);
        return -4;
      }
      for (size_t i = 0; i < count; ++i) {
        uint16_t be = raw[i];
        vals[i] = (uint32_t)(((be & 0xFF) << 8) | (be >> 8));
      }
    } else {
      std::vector<uint8_t> raw(count);
      if (std::fread(raw.data(), 1, count, f) != count) {
        std::fclose(f);
        return -4;
      }
      for (size_t i = 0; i < count; ++i) vals[i] = raw[i];
    }
  } else {
    for (size_t i = 0; i < count; ++i) {
      long v = read_int();
      if (v < 0) {
        std::fclose(f);
        return -4;
      }
      vals[i] = (uint32_t)v;
    }
  }
  std::fclose(f);

  uint8_t* img = static_cast<uint8_t*>(std::malloc((size_t)W * H));
  if (!img) return -5;
  for (long i = 0; i < W * H; ++i) {
    uint32_t g;
    if (channels == 3) {
      // BT.601, same as the device path (ProgramCU.cu:381)
      double r = vals[i * 3] * 255.0 / maxv;
      double gg = vals[i * 3 + 1] * 255.0 / maxv;
      double b = vals[i * 3 + 2] * 255.0 / maxv;
      g = (uint32_t)(0.299 * r + 0.587 * gg + 0.114 * b + 0.5);
    } else {
      g = vals[i] * 255u / (uint32_t)maxv;
    }
    img[i] = (uint8_t)(g > 255 ? 255 : g);
  }
  *out = img;
  *w = (int)W;
  *h = (int)H;
  return 0;
}

void hessio_free(void* p) { std::free(p); }

// Write the reference text .sift format (SiftPyramid.cpp:503-567):
// header "N dim", per keypoint "y x s o response type level" then dim ints
// floor(0.5 + 512*d), 20 per line. Returns 0 on success.
int hessio_write_sift_text(const char* path, int n, int dim,
                           const float* x, const float* y, const float* s,
                           const float* o, const float* response,
                           const int32_t* ftype, const int32_t* level,
                           const float* desc) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::fprintf(f, "%d %d\n", n, dim);
  for (int i = 0; i < n; ++i) {
    std::fprintf(f, "%.2f %.2f %.3f %.3f %.8f %d %d\n",
                 y[i], x[i], s[i], o[i], response[i], ftype[i], level[i]);
    if (dim > 0) {
      const float* d = desc + (size_t)i * dim;
      for (int k = 0; k < dim; ++k) {
        long q = (long)std::floor(0.5 + 512.0 * d[k]);
        std::fprintf(f, "%ld%c", q,
                     ((k + 1) % 20 == 0 || k + 1 == dim) ? '\n' : ' ');
      }
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
