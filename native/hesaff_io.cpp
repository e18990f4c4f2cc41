// hesaff_tpu native host runtime: image decode + .hesaff.sift text IO.
//
// The TPU does the math; the host shell around it (file IO, text
// serialization) is the reference's C++ role (hesaff.cpp:107-180) and
// stays native here too: formatting ~10^6 floats per fleet batch in
// Python is a real bottleneck.  Exposed as a C ABI consumed via ctypes
// (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC hesaff_io.cpp -o libhesaff_io.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Decode binary PPM (P6) / PGM (P5) to float32 gray using the
// reference's equal-weight (R+G+B)/3 conversion (hesaff.cpp:140-148).
// Returns 0 on success; fills *width/*height; caller provides `out`
// sized max_pixels (returns -2 if too small, -1 on parse error).
int hesaff_decode_pnm_gray(const uint8_t *data, int64_t size,
                           float *out, int64_t max_pixels,
                           int32_t *width, int32_t *height) {
  if (size < 10 || data[0] != 'P') return -1;
  int channels;
  if (data[1] == '6') channels = 3;
  else if (data[1] == '5') channels = 1;
  else return -1;

  int64_t pos = 2;
  int64_t fields[3];
  for (int f = 0; f < 3;) {
    // skip whitespace and comments
    while (pos < size &&
           (data[pos] == ' ' || data[pos] == '\t' || data[pos] == '\n' ||
            data[pos] == '\r')) pos++;
    if (pos < size && data[pos] == '#') {
      while (pos < size && data[pos] != '\n') pos++;
      continue;
    }
    int64_t v = 0;
    bool any = false;
    while (pos < size && data[pos] >= '0' && data[pos] <= '9') {
      v = v * 10 + (data[pos] - '0');
      pos++;
      any = true;
    }
    if (!any) return -1;
    fields[f++] = v;
  }
  pos++;  // single whitespace after maxval
  int64_t w = fields[0], h = fields[1], maxval = fields[2];
  if (maxval > 255 || w <= 0 || h <= 0) return -1;
  if (w * h > max_pixels) return -2;
  if (pos + w * h * channels > size) return -1;

  const uint8_t *p = data + pos;
  if (channels == 3) {
    for (int64_t i = 0; i < w * h; i++) {
      out[i] = (float(p[0]) + float(p[1]) + float(p[2])) / 3.0f;
      p += 3;
    }
  } else {
    for (int64_t i = 0; i < w * h; i++) out[i] = float(p[i]);
  }
  *width = (int32_t)w;
  *height = (int32_t)h;
  return 0;
}

// C++-ostream-compatible "%.6g"-style float formatting (the reference
// writes via operator<< with default precision 6, hesaff.cpp:125).
static inline int fmt_float(char *buf, double v) {
  int n = snprintf(buf, 32, "%.6g", v);
  return n;
}

// Write the Oxford .hesaff.sift text format:
//   128\n N\n  (u v e00 e01 e11 d0..d127)\n per keypoint.
// desc is (n, 128) uint8.  Returns 0 on success, -1 on IO error.
int hesaff_write_sift(const char *path, int64_t n, const double *u,
                      const double *v, const double *e00,
                      const double *e01, const double *e11,
                      const uint8_t *desc) {
  FILE *f = fopen(path, "w");
  if (!f) return -1;
  // generous per-line buffer: 5 floats + 128 short ints
  char *line = (char *)malloc(5 * 34 + 128 * 5 + 8);
  if (!line) { fclose(f); return -1; }
  fprintf(f, "128\n%lld\n", (long long)n);
  for (int64_t i = 0; i < n; i++) {
    char *q = line;
    q += fmt_float(q, u[i]);
    *q++ = ' ';
    q += fmt_float(q, v[i]);
    *q++ = ' ';
    q += fmt_float(q, e00[i]);
    *q++ = ' ';
    q += fmt_float(q, e01[i]);
    *q++ = ' ';
    q += fmt_float(q, e11[i]);
    const uint8_t *d = desc + i * 128;
    for (int j = 0; j < 128; j++) {
      *q++ = ' ';
      int val = d[j];
      if (val >= 100) { *q++ = '0' + val / 100; val %= 100;
        *q++ = '0' + val / 10; *q++ = '0' + val % 10; }
      else if (val >= 10) { *q++ = '0' + val / 10; *q++ = '0' + val % 10; }
      else *q++ = '0' + val;
    }
    *q++ = '\n';
    if (fwrite(line, 1, q - line, f) != (size_t)(q - line)) {
      free(line); fclose(f); return -1;
    }
  }
  free(line);
  return fclose(f) == 0 ? 0 : -1;
}

// Parse a .hesaff.sift file: fills geom (n, 5) doubles and desc
// (n, 128) uint8.  First call with geom == NULL to query n (returns n,
// or -1 on error); then call again with buffers sized for n.
int64_t hesaff_read_sift(const char *path, double *geom, uint8_t *desc,
                         int64_t max_n) {
  FILE *f = fopen(path, "r");
  if (!f) return -1;
  int dim;
  long long n;
  if (fscanf(f, "%d %lld", &dim, &n) != 2 || dim != 128) {
    fclose(f);
    return -1;
  }
  if (geom == NULL) {
    fclose(f);
    return (int64_t)n;
  }
  if (n > max_n) { fclose(f); return -1; }
  for (int64_t i = 0; i < n; i++) {
    for (int j = 0; j < 5; j++)
      if (fscanf(f, "%lf", &geom[i * 5 + j]) != 1) { fclose(f); return -1; }
    for (int j = 0; j < 128; j++) {
      int v;
      if (fscanf(f, "%d", &v) != 1) { fclose(f); return -1; }
      desc[i * 128 + j] = (uint8_t)v;
    }
  }
  fclose(f);
  return (int64_t)n;
}

}  // extern "C"

// --- PNG decode (8-bit, non-interlaced; gray/RGB/palette/alpha) ---
//
// The reference accepts anything cv::imread reads (hesaff.cpp:137);
// PNM covers the benchmark corpus but real fleets carry PNG.  This is
// a dependency-free decoder over zlib: IDAT inflate + per-row filter
// reconstruction (types 0-4), then the same equal-weight (R+G+B)/3
// gray conversion (alpha ignored, as cv::imread's default BGR load).
// 16-bit samples take the high byte — identical to cv::imread's
// default path (libpng png_set_strip_16).  Interlaced (Adam7) files
// return -1 and callers fall back to PIL.

#include <zlib.h>

static uint32_t be32(const uint8_t *p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}

extern "C" int hesaff_decode_png_gray(const uint8_t *data, int64_t size,
                                      float *out, int64_t max_pixels,
                                      int32_t *width, int32_t *height) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 45 || memcmp(data, sig, 8) != 0) return -1;
  if (be32(data + 8) != 13 || memcmp(data + 12, "IHDR", 4) != 0) return -1;
  const uint32_t w = be32(data + 16), h = be32(data + 20);
  const int bitdepth = data[24], color = data[25];
  const int comp = data[26], filt = data[27], inter = data[28];
  if ((bitdepth != 8 && bitdepth != 16) || comp != 0 || filt != 0 ||
      inter != 0)
    return -1;
  if (bitdepth == 16 && color == 3) return -1;  // invalid per spec
  int ch;
  switch (color) {
    case 0: ch = 1; break;   // gray
    case 2: ch = 3; break;   // rgb
    case 3: ch = 1; break;   // palette
    case 4: ch = 2; break;   // gray+alpha
    case 6: ch = 4; break;   // rgba
    default: return -1;
  }
  if (w == 0 || h == 0) return -1;
  if ((int64_t)w * h > max_pixels) return -2;

  const uint8_t *plte = nullptr;
  int64_t plte_n = 0;
  uint8_t *idat = nullptr;
  size_t idat_sz = 0;
  int64_t pos = 33;  // signature + IHDR chunk
  while (pos + 12 <= size) {
    const uint32_t len = be32(data + pos);
    const uint8_t *type = data + pos + 4;
    if (pos + 12 + (int64_t)len > size) { free(idat); return -1; }
    const uint8_t *payload = data + pos + 8;
    if (memcmp(type, "PLTE", 4) == 0) {
      plte = payload;
      plte_n = len / 3;
    } else if (memcmp(type, "IDAT", 4) == 0) {
      uint8_t *nb = (uint8_t *)realloc(idat, idat_sz + len);
      if (!nb) { free(idat); return -1; }
      idat = nb;
      memcpy(idat + idat_sz, payload, len);
      idat_sz += len;
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + (int64_t)len;
  }
  if (!idat || (color == 3 && !plte)) { free(idat); return -1; }

  const int bytes = bitdepth / 8;
  const int bpp = ch * bytes;  // PNG filters operate bytewise on bpp
  const int64_t stride = (int64_t)w * bpp;
  const int64_t rawsz = (stride + 1) * h;
  uint8_t *raw = (uint8_t *)malloc(rawsz);
  if (!raw) { free(idat); return -1; }
  uLongf dl = (uLongf)rawsz;
  const int zrc = uncompress(raw, &dl, idat, (uLong)idat_sz);
  free(idat);
  if (zrc != Z_OK || (int64_t)dl != rawsz) { free(raw); return -1; }

  for (uint32_t r = 0; r < h; r++) {
    uint8_t *row = raw + (int64_t)r * (stride + 1);
    const int f = row[0];
    uint8_t *cur = row + 1;
    const uint8_t *up = r ? raw + (int64_t)(r - 1) * (stride + 1) + 1
                          : nullptr;
    for (int64_t i = 0; i < stride; i++) {
      const int a = i >= bpp ? cur[i - bpp] : 0;
      const int b = up ? up[i] : 0;
      const int c = (up && i >= bpp) ? up[i - bpp] : 0;
      int x = cur[i];
      switch (f) {
        case 0: break;
        case 1: x += a; break;
        case 2: x += b; break;
        case 3: x += (a + b) >> 1; break;
        case 4: {
          const int p = a + b - c;
          const int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
          x += (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          break;
        }
        default: free(raw); return -1;
      }
      cur[i] = (uint8_t)x;
    }
    float *orow = out + (int64_t)r * w;
    for (uint32_t cx = 0; cx < w; cx++) {
      const uint8_t *px = cur + (int64_t)cx * bpp;
      float v;
      // 16-bit: sample value = high byte (big-endian first byte) —
      // cv::imread's strip-16 conversion
      if (color == 0 || color == 4) {
        v = px[0];
      } else if (color == 3) {
        if (px[0] >= plte_n) { free(raw); return -1; }
        const uint8_t *pp = plte + 3 * px[0];
        v = ((float)pp[0] + pp[1] + pp[2]) / 3.0f;
      } else {
        v = ((float)px[0] + px[bytes] + px[2 * bytes]) / 3.0f;
      }
      orow[cx] = v;
    }
  }
  free(raw);
  *width = (int32_t)w;
  *height = (int32_t)h;
  return 0;
}
