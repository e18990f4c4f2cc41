// Baseline JPEG decoder for the hesaff_tpu native host runtime.
//
// The reference accepts anything cv::imread reads
// (/root/reference/hesaff.cpp:137); fleets carry JPEG, so the native
// loader decodes it without a Python round-trip.  Scope: baseline and
// extended-sequential DCT (SOF0/SOF1) and progressive DCT (SOF2,
// spectral selection + successive approximation, interleaved DC and
// single-component AC scans, EOB runs), 8-bit, Huffman-coded, 1- or
// 3-component (gray / YCbCr), any sampling factors h,v in [1,4],
// restart markers.  Arithmetic coding, 12-bit, and CMYK return -1 and
// callers fall back to PIL.
//
// Gray output uses the same per-channel clamp + equal-weight
// (R+G+B)/3 as the reference's BGR load + /3 conversion
// (hesaff.cpp:140-148).  IDCT is a float separable transform;
// chroma upsampling is nearest-neighbour — both within ~1 LSB of
// libjpeg's integer pipeline away from block edges (decode parity is
// tolerance-gated, not bit-gated; JPEG itself does not specify a
// bit-exact decoder).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t *data;
  int64_t size;
  int64_t pos;
  uint32_t bits;   // bit buffer, MSB-aligned consumption from `count`
  int count;       // valid bits in buffer
  bool hit_marker; // stopped at a non-RST marker (or EOF)

  void reset_at(int64_t p) {
    pos = p;
    bits = 0;
    count = 0;
    hit_marker = false;
  }

  // refill one byte, honoring 0xFF00 stuffing; at a real marker the
  // reader sticks (returns zero bits) and flags hit_marker
  void fill() {
    while (count <= 24) {
      if (pos >= size) { hit_marker = true; bits |= 0; count += 8; continue; }
      uint8_t b = data[pos];
      if (b == 0xFF) {
        if (pos + 1 < size && data[pos + 1] == 0x00) {
          pos += 2;
        } else {
          // marker: stop consuming (caller handles RST/EOI)
          hit_marker = true;
          count += 8;  // feed zeros so draining reads don't loop forever
          continue;
        }
      } else {
        pos += 1;
      }
      bits |= (uint32_t)b << (24 - count);
      count += 8;
    }
  }

  int get_bits(int n) {
    if (n == 0) return 0;
    if (count < n) fill();
    int v = (int)(bits >> (32 - n));
    bits <<= n;
    count -= n;
    return v;
  }

  int peek16() {
    if (count < 16) fill();
    return (int)(bits >> 16);
  }

  void drop(int n) {
    bits <<= n;
    count -= n;
  }
};

// JPEG "receive and extend" (spec F.2.2.1)
inline int extend(int v, int n) {
  return (n && v < (1 << (n - 1))) ? v - (1 << n) + 1 : v;
}

struct Huff {
  // lookup: first 8 bits -> (value, length) fast path; long codes via
  // canonical max/min code table
  uint8_t fast_val[256];
  int8_t fast_len[256];
  int32_t maxcode[18];
  int32_t mincode[18];
  int32_t valptr[18];
  uint8_t vals[256];
  bool present = false;

  bool build(const uint8_t *bits_counts, const uint8_t *huffval, int nvals) {
    memcpy(vals, huffval, nvals);
    int code = 0, k = 0;
    memset(fast_len, -1, sizeof(fast_len));
    for (int l = 1; l <= 16; l++) {
      valptr[l] = k;
      mincode[l] = code;
      int n = bits_counts[l - 1];
      if (k + n > nvals) return false;
      if (l <= 8) {
        for (int i = 0; i < n; i++) {
          int c = code + i;
          int shift = 8 - l;
          for (int f = c << shift; f < ((c + 1) << shift); f++) {
            fast_val[f] = huffval[k + i];
            fast_len[f] = (int8_t)l;
          }
        }
      }
      code += n;
      k += n;
      maxcode[l] = code - 1;
      if (code > (1 << l)) return false;  // over-subscribed
      code <<= 1;
    }
    maxcode[17] = 0x7fffffff;
    present = true;
    return true;
  }

  int decode(BitReader &br) const {
    int look = br.peek16();
    int f8 = look >> 8;
    if (fast_len[f8] > 0) {
      br.drop(fast_len[f8]);
      return fast_val[f8];
    }
    // long path: walk lengths 9..16
    int code = 0, l;
    for (l = 1; l <= 16; l++) {
      code = look >> (16 - l);
      if (l >= 9 && code <= maxcode[l]) break;
      if (l == 16 && code > maxcode[16]) return -1;
    }
    if (l > 16) return -1;
    br.drop(l);
    int idx = valptr[l] + (code - mincode[l]);
    if (idx < 0 || idx >= 256) return -1;
    return vals[idx];
  }
};

const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// separable float IDCT, 8x8; in: dequantized coefficients (natural
// order), out: spatial samples + 128 level shift, clamped [0, 255]
void idct8x8(const float *in, uint8_t *out, int out_stride) {
  static float cs[8][8];
  static bool init = false;
  if (!init) {
    for (int u = 0; u < 8; u++)
      for (int x = 0; x < 8; x++)
        cs[u][x] = (float)(((u == 0) ? 0.353553390593273762 : 0.5) *
                           cos((2 * x + 1) * u * 3.14159265358979324 / 16.0));
    init = true;
  }
  float tmp[64];
  for (int u = 0; u < 8; u++) {     // rows: 1-D IDCT over columns index v
    for (int x = 0; x < 8; x++) {
      float s = 0.f;
      for (int v = 0; v < 8; v++) s += cs[v][x] * in[u * 8 + v];
      tmp[u * 8 + x] = s;
    }
  }
  for (int x = 0; x < 8; x++) {     // columns
    for (int y = 0; y < 8; y++) {
      float s = 0.f;
      for (int u = 0; u < 8; u++) s += cs[u][y] * tmp[u * 8 + x];
      float val = s + 128.0f;
      int iv = (int)lrintf(val);
      out[y * out_stride + x] =
          (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
    }
  }
}

struct Component {
  int id = 0, h = 1, v = 1, tq = 0;
  int td = 0, ta = 0;
  int dc_pred = 0;
  // plane at component resolution, padded to whole MCU blocks
  uint8_t *plane = nullptr;
  int64_t pw = 0, ph = 0;  // padded plane dims
  // progressive: per-block coefficients in ZIGZAG order, accumulated
  // across scans; IDCT'd once at EOI
  int32_t *coefs = nullptr;
  int64_t bw = 0, bh = 0;  // padded block-grid dims
};

struct Decoder {
  const uint8_t *data;
  int64_t size;
  uint16_t qt[4][64];   // natural order
  bool qt_present[4] = {false, false, false, false};
  Huff hdc[4], hac[4];
  Component comp[3];
  int ncomp = 0;
  int W = 0, H = 0;
  int hmax = 1, vmax = 1;
  int restart_interval = 0;
  bool progressive = false;
  bool planes_alloc = false;
  int scans_done = 0;
  int eobrun = 0;

  ~Decoder() {
    for (int c = 0; c < 3; c++) {
      free(comp[c].plane);
      free(comp[c].coefs);
    }
  }

  int alloc_planes(bool with_coefs) {
    if (planes_alloc) return 0;
    int64_t mcux = (W + hmax * 8 - 1) / (hmax * 8);
    int64_t mcuy = (H + vmax * 8 - 1) / (vmax * 8);
    for (int ci = 0; ci < ncomp; ci++) {
      Component &c = comp[ci];
      c.pw = mcux * c.h * 8;
      c.ph = mcuy * c.v * 8;
      c.bw = c.pw / 8;
      c.bh = c.ph / 8;
      c.plane = (uint8_t *)malloc(c.pw * c.ph);
      if (!c.plane) return -1;
      if (with_coefs) {
        c.coefs = (int32_t *)calloc(c.bw * c.bh * 64, sizeof(int32_t));
        if (!c.coefs) return -1;
      }
      c.dc_pred = 0;
    }
    planes_alloc = true;
    return 0;
  }

  int64_t next_marker(int64_t from) {
    // first real (non-stuffing, non-RST) marker at/after `from`
    int64_t q = from;
    while (q + 1 < size) {
      if (data[q] == 0xFF && data[q + 1] != 0x00 &&
          !(data[q + 1] >= 0xD0 && data[q + 1] <= 0xD7))
        return q;
      q++;
    }
    return size;
  }

  int u16(int64_t p) { return (data[p] << 8) | data[p + 1]; }

  // decode one 8x8 block of component c into its plane at (bx, by)
  bool block(BitReader &br, Component &c, int64_t bx, int64_t by) {
    const Huff &dc = hdc[c.td];
    const Huff &ac = hac[c.ta];
    const uint16_t *q = qt[c.tq];
    float coef[64];
    memset(coef, 0, sizeof(coef));
    int t = dc.decode(br);
    if (t < 0 || t > 15) return false;
    int diff = t ? extend(br.get_bits(t), t) : 0;
    c.dc_pred += diff;
    coef[0] = (float)(c.dc_pred * (int)q[0]);
    for (int k = 1; k < 64;) {
      int rs = ac.decode(br);
      if (rs < 0) return false;
      int r = rs >> 4, s = rs & 15;
      if (s == 0) {
        if (r == 15) { k += 16; continue; }  // ZRL
        break;                                // EOB
      }
      k += r;
      if (k > 63) return false;
      int zz = kZigzag[k];
      coef[zz] = (float)(extend(br.get_bits(s), s) * (int)q[zz]);
      k++;
    }
    idct8x8(coef, c.plane + by * 8 * c.pw + bx * 8, (int)c.pw);
    return true;
  }

  // ---- progressive scan machinery (spec G.2; the standard EOB-run
  // + successive-approximation algorithm) ----

  int32_t *coef_of(Component &c, int64_t bx, int64_t by) {
    return c.coefs + (by * c.bw + bx) * 64;
  }

  bool prog_dc(BitReader &br, Component &c, int64_t bx, int64_t by,
               int Ah, int Al) {
    int32_t *co = coef_of(c, bx, by);
    if (Ah == 0) {                       // first pass
      int t = hdc[c.td].decode(br);
      if (t < 0 || t > 15) return false;
      int diff = t ? extend(br.get_bits(t), t) : 0;
      c.dc_pred += diff;
      co[0] = c.dc_pred * (1 << Al);
    } else {                             // refinement: one raw bit
      if (br.get_bits(1)) co[0] |= (1 << Al);
    }
    return true;
  }

  bool prog_ac_first(BitReader &br, Component &c, int64_t bx,
                     int64_t by, int Ss, int Se, int Al) {
    if (eobrun > 0) { eobrun--; return true; }
    int32_t *co = coef_of(c, bx, by);
    for (int k = Ss; k <= Se;) {
      int rs = hac[c.ta].decode(br);
      if (rs < 0) return false;
      int r = rs >> 4, sbits = rs & 15;
      if (sbits == 0) {
        if (r == 15) { k += 16; continue; }          // ZRL
        eobrun = (1 << r) - 1;
        if (r) eobrun += br.get_bits(r);
        break;                                        // EOBn
      }
      k += r;
      if (k > Se || k > 63) return false;
      co[k] = extend(br.get_bits(sbits), sbits) * (1 << Al);
      k++;
    }
    return true;
  }

  bool prog_ac_refine(BitReader &br, Component &c, int64_t bx,
                      int64_t by, int Ss, int Se, int Al) {
    int32_t *co = coef_of(c, bx, by);
    const int p1 = 1 << Al, m1 = -(1 << Al);
    int k = Ss;
    if (eobrun == 0) {
      while (k <= Se) {
        int rs = hac[c.ta].decode(br);
        if (rs < 0) return false;
        int r = rs >> 4, sbits = rs & 15;
        int newval = 0;
        if (sbits == 0) {
          if (r != 15) {                 // EOBn: finish via correction
            eobrun = (1 << r);
            if (r) eobrun += br.get_bits(r);
            break;
          }
          // ZRL: skip 16 zero-history coeffs (with corrections)
        } else {
          if (sbits != 1) return false;
          newval = br.get_bits(1) ? p1 : m1;
        }
        while (k <= Se) {
          int32_t &cc = co[k];
          if (cc != 0) {
            if (br.get_bits(1) && (cc & p1) == 0)
              cc += (cc >= 0 ? p1 : m1);
          } else {
            if (r == 0) {
              if (newval) cc = newval;
              k++;
              break;
            }
            r--;
          }
          k++;
        }
      }
    }
    if (eobrun > 0) {
      for (; k <= Se; k++) {
        int32_t &cc = co[k];
        if (cc != 0 && br.get_bits(1) && (cc & p1) == 0)
          cc += (cc >= 0 ? p1 : m1);
      }
      eobrun--;
    }
    return true;
  }

  // restart handling shared by both scan loops: expect RSTn at a
  // marker boundary, reset predictors + EOB run
  bool do_restart(BitReader &br, int &rst_count) {
    int64_t q2 = br.pos;
    while (q2 + 1 < size &&
           !(data[q2] == 0xFF && data[q2 + 1] != 0x00))
      q2++;
    if (q2 + 1 >= size) return false;
    uint8_t m = data[q2 + 1];
    if (m < 0xD0 || m > 0xD7) return false;
    if (m != 0xD0 + (rst_count & 7)) return false;
    rst_count++;
    br.reset_at(q2 + 2);
    for (int ci = 0; ci < ncomp; ci++) comp[ci].dc_pred = 0;
    eobrun = 0;
    return true;
  }

  int decode_scan_progressive(int64_t p, int ns, const int *sc,
                              int Ss, int Se, int Ah, int Al) {
    BitReader br{data, size, 0, 0, 0, false};
    br.reset_at(p);
    eobrun = 0;
    int rst_count = 0;
    if (ns == 1) {
      // non-interleaved: raster over the component's REAL block grid
      Component &c = comp[sc[0]];
      const int64_t cw = ((int64_t)W * c.h + hmax - 1) / hmax;
      const int64_t chh = ((int64_t)H * c.v + vmax - 1) / vmax;
      const int64_t nbx = (cw + 7) / 8, nby = (chh + 7) / 8;
      int64_t blk = 0;
      for (int64_t by = 0; by < nby; by++) {
        for (int64_t bx = 0; bx < nbx; bx++, blk++) {
          if (restart_interval && blk &&
              (blk % restart_interval) == 0) {
            if (!do_restart(br, rst_count)) return -1;
          }
          bool ok;
          if (Ss == 0) {
            ok = prog_dc(br, c, bx, by, Ah, Al);
          } else if (Ah == 0) {
            ok = prog_ac_first(br, c, bx, by, Ss, Se, Al);
          } else {
            ok = prog_ac_refine(br, c, bx, by, Ss, Se, Al);
          }
          if (!ok) return -1;
        }
      }
      return 0;
    }
    // interleaved (DC scans only, per spec): MCU order
    if (Ss != 0) return -1;
    int64_t mcux = (W + hmax * 8 - 1) / (hmax * 8);
    int64_t mcuy = (H + vmax * 8 - 1) / (vmax * 8);
    int64_t mcu = 0, nmcu = mcux * mcuy;
    while (mcu < nmcu) {
      if (restart_interval && mcu && (mcu % restart_interval) == 0) {
        if (!do_restart(br, rst_count)) return -1;
      }
      int64_t mx = mcu % mcux, my = mcu / mcux;
      for (int si = 0; si < ns; si++) {
        Component &c = comp[sc[si]];
        for (int by = 0; by < c.v; by++)
          for (int bx = 0; bx < c.h; bx++)
            if (!prog_dc(br, c, mx * c.h + bx, my * c.v + by, Ah, Al))
              return -1;
      }
      mcu++;
    }
    return 0;
  }

  int finish_progressive(float *out, int32_t *width, int32_t *height) {
    for (int ci = 0; ci < ncomp; ci++) {
      Component &c = comp[ci];
      const uint16_t *q = qt[c.tq];
      float coefn[64];
      for (int64_t by = 0; by < c.bh; by++) {
        for (int64_t bx = 0; bx < c.bw; bx++) {
          const int32_t *co = coef_of(c, bx, by);
          for (int k = 0; k < 64; k++) {
            int zz = kZigzag[k];
            coefn[zz] = (float)(co[k] * (int32_t)q[zz]);
          }
          idct8x8(coefn, c.plane + by * 8 * c.pw + bx * 8, (int)c.pw);
        }
      }
    }
    return emit(out, width, height);
  }

  int decode_scan(int64_t p) {
    if (alloc_planes(false) != 0) return -1;
    BitReader br{data, size, 0, 0, 0, false};
    br.reset_at(p);
    int64_t mcux = (W + hmax * 8 - 1) / (hmax * 8);
    int64_t mcuy = (H + vmax * 8 - 1) / (vmax * 8);
    int64_t mcu = 0, nmcu = mcux * mcuy;
    int rst_count = 0;
    while (mcu < nmcu) {
      if (restart_interval && mcu && (mcu % restart_interval) == 0) {
        // align to marker boundary; expect RSTn
        int64_t q2 = br.pos;
        // find next marker at/after current position
        while (q2 + 1 < size &&
               !(data[q2] == 0xFF && data[q2 + 1] != 0x00))
          q2++;
        if (q2 + 1 >= size) return -1;
        uint8_t m = data[q2 + 1];
        if (m < 0xD0 || m > 0xD7) return -1;
        if (m != 0xD0 + (rst_count & 7)) return -1;
        rst_count++;
        br.reset_at(q2 + 2);
        for (int ci = 0; ci < ncomp; ci++) comp[ci].dc_pred = 0;
      }
      int64_t mx = mcu % mcux, my = mcu / mcux;
      for (int ci = 0; ci < ncomp; ci++) {
        Component &c = comp[ci];
        for (int by = 0; by < c.v; by++)
          for (int bx = 0; bx < c.h; bx++)
            if (!block(br, c, mx * c.h + bx, my * c.v + by)) return -1;
      }
      mcu++;
    }
    return 0;
  }

  int parse_and_decode(float *out, int64_t max_pixels, int32_t *width,
                       int32_t *height) {
    if (size < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;
    int64_t p = 2;
    bool have_sof = false;
    while (p + 4 <= size) {
      if (data[p] != 0xFF) return -1;
      uint8_t m = data[p + 1];
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { p += 2; continue; }
      if (m == 0xD9) {
        // EOI: a progressive stream finishes here (dequant + IDCT of
        // the accumulated coefficients); baseline means no SOS seen
        if (progressive && scans_done > 0)
          return finish_progressive(out, width, height);
        break;
      }
      int64_t len = u16(p + 2);
      if (p + 2 + len > size) return -1;
      int64_t q2 = p + 4;
      switch (m) {
        case 0xC0: case 0xC1: case 0xC2: {  // SOF0 / SOF1 / SOF2
          progressive = (m == 0xC2);
          if (data[q2] != 8) return -1;  // 8-bit only
          H = u16(q2 + 1);
          W = u16(q2 + 3);
          ncomp = data[q2 + 5];
          if (W <= 0 || H <= 0) return -1;
          if (ncomp != 1 && ncomp != 3) return -1;  // gray / YCbCr
          if ((int64_t)W * H > max_pixels) return -2;
          for (int i = 0; i < ncomp; i++) {
            Component &c = comp[i];
            c.id = data[q2 + 6 + 3 * i];
            c.h = data[q2 + 7 + 3 * i] >> 4;
            c.v = data[q2 + 7 + 3 * i] & 15;
            c.tq = data[q2 + 8 + 3 * i];
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
              return -1;
            hmax = c.h > hmax ? c.h : hmax;
            vmax = c.v > vmax ? c.v : vmax;
          }
          have_sof = true;
          break;
        }
        case 0xC3: case 0xC5: case 0xC6: case 0xC7:
        case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return -1;  // lossless / arithmetic: unsupported
        case 0xC4: {  // DHT (possibly multiple tables)
          int64_t r = q2;
          while (r < p + 2 + len) {
            int tc = data[r] >> 4, th = data[r] & 15;
            if (tc > 1 || th > 3) return -1;
            int nv = 0;
            for (int i = 0; i < 16; i++) nv += data[r + 1 + i];
            if (nv > 256 || r + 17 + nv > p + 2 + len) return -1;
            Huff &hf = tc ? hac[th] : hdc[th];
            if (!hf.build(data + r + 1, data + r + 17, nv)) return -1;
            r += 17 + nv;
          }
          break;
        }
        case 0xDB: {  // DQT
          int64_t r = q2;
          while (r < p + 2 + len) {
            int pq = data[r] >> 4, tq2 = data[r] & 15;
            if (pq > 1 || tq2 > 3) return -1;
            r += 1;
            for (int i = 0; i < 64; i++) {
              int v = pq ? ((data[r] << 8) | data[r + 1]) : data[r];
              qt[tq2][kZigzag[i]] = (uint16_t)v;
              r += pq ? 2 : 1;
            }
            qt_present[tq2] = true;
          }
          break;
        }
        case 0xDD:  // DRI
          restart_interval = u16(q2);
          break;
        case 0xDA: {  // SOS
          if (!have_sof) return -1;
          int ns = data[q2];
          if (ns < 1 || ns > ncomp) return -1;
          if (!progressive && ns != ncomp)
            return -1;  // sequential: single interleaved scan only
          int sc[4];
          for (int i = 0; i < ns; i++) {
            int cs = data[q2 + 1 + 2 * i];
            int tt = data[q2 + 2 + 2 * i];
            int found = -1;
            for (int c = 0; c < ncomp; c++)
              if (comp[c].id == cs) found = c;
            if (found < 0) return -1;
            sc[i] = found;
            comp[found].td = tt >> 4;
            comp[found].ta = tt & 15;
            if (comp[found].td > 3 || comp[found].ta > 3) return -1;
            if (!qt_present[comp[found].tq]) return -1;
          }
          int Ss = data[q2 + 1 + 2 * ns];
          int Se = data[q2 + 2 + 2 * ns];
          int Ah = data[q2 + 3 + 2 * ns] >> 4;
          int Al = data[q2 + 3 + 2 * ns] & 15;
          if (!progressive) {
            for (int i = 0; i < ns; i++)
              if (!hdc[comp[sc[i]].td].present ||
                  !hac[comp[sc[i]].ta].present)
                return -1;
            int rc = decode_scan(p + 2 + len);
            if (rc != 0) return rc;
            return emit(out, width, height);
          }
          // progressive scan validation (spec G.1.1.1.1): DC scans
          // have Ss=Se=0 (interleave allowed); AC scans are single-
          // component with 1<=Ss<=Se<=63.  DC refinement reads raw
          // bits (no table); AC scans need the AC table.
          if (Ss == 0) {
            if (Se != 0) return -1;
            if (Ah == 0)
              for (int i = 0; i < ns; i++)
                if (!hdc[comp[sc[i]].td].present) return -1;
          } else {
            if (ns != 1 || Se < Ss || Se > 63) return -1;
            if (!hac[comp[sc[0]].ta].present) return -1;
          }
          if (Ah > 13 || Al > 13) return -1;
          if (alloc_planes(true) != 0) return -1;
          int rc = decode_scan_progressive(p + 2 + len, ns, sc,
                                           Ss, Se, Ah, Al);
          if (rc != 0) return rc;
          scans_done++;
          p = next_marker(p + 2 + len);
          continue;  // parse the next marker segment
        }
        default:
          break;  // APPn / COM / others: skip
      }
      p += 2 + len;
    }
    // a progressive stream's trailing EOI can sit within the last 4
    // bytes (the loop guard skips it) — finish here as well
    if (progressive && scans_done > 0)
      return finish_progressive(out, width, height);
    return -1;  // no SOS found
  }

  // upsample component c to full (W, H) resolution.  The 2x case uses
  // the triangular filter (libjpeg "fancy" upsampling — what
  // cv::imread's default pipeline applies): out[2i] = .75 s[i] +
  // .25 s[i-1], out[2i+1] = .75 s[i] + .25 s[i+1]; other ratios use
  // nearest-neighbour (rare in practice).
  float *upsample(Component &c) {
    float *up = (float *)malloc(sizeof(float) * (int64_t)W * H);
    if (!up) return nullptr;
    const int rx = hmax / c.h, ry = vmax / c.v;
    const int64_t cw = ((int64_t)W * c.h + hmax - 1) / hmax;
    const int64_t chh = ((int64_t)H * c.v + vmax - 1) / vmax;
    // horizontal pass into a (cw-res rows) x W buffer
    float *hor = (float *)malloc(sizeof(float) * (int64_t)W * chh);
    if (!hor) { free(up); return nullptr; }
    for (int64_t r = 0; r < chh; r++) {
      const uint8_t *src = c.plane + r * c.pw;
      float *dst = hor + r * W;
      if (rx == 1) {
        for (int64_t x = 0; x < W; x++) dst[x] = src[x < cw ? x : cw - 1];
      } else if (rx == 2) {
        for (int64_t x = 0; x < W; x++) {
          int64_t sx = x >> 1;
          if (sx >= cw) sx = cw - 1;
          int64_t nb = (x & 1) ? sx + 1 : sx - 1;
          if (nb < 0) nb = 0;
          if (nb >= cw) nb = cw - 1;
          dst[x] = 0.75f * src[sx] + 0.25f * src[nb];
        }
      } else {
        for (int64_t x = 0; x < W; x++) {
          int64_t sx = x / rx;
          dst[x] = src[sx < cw ? sx : cw - 1];
        }
      }
    }
    // vertical pass
    for (int64_t y = 0; y < H; y++) {
      float *dst = up + y * W;
      if (ry == 1) {
        int64_t sy = y < chh ? y : chh - 1;
        memcpy(dst, hor + sy * W, sizeof(float) * W);
      } else if (ry == 2) {
        int64_t sy = y >> 1;
        if (sy >= chh) sy = chh - 1;
        int64_t nb = (y & 1) ? sy + 1 : sy - 1;
        if (nb < 0) nb = 0;
        if (nb >= chh) nb = chh - 1;
        const float *s0 = hor + sy * W, *s1 = hor + nb * W;
        for (int64_t x = 0; x < W; x++)
          dst[x] = 0.75f * s0[x] + 0.25f * s1[x];
      } else {
        int64_t sy = y / ry;
        memcpy(dst, hor + (sy < chh ? sy : chh - 1) * W,
               sizeof(float) * W);
      }
    }
    free(hor);
    return up;
  }

  int emit(float *out, int32_t *width, int32_t *height) {
    if (ncomp == 1) {
      Component &Y = comp[0];
      for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++)
          out[(int64_t)y * W + x] = (float)Y.plane[(int64_t)y * Y.pw + x];
    } else {
      Component &Y = comp[0], &Cb = comp[1], &Cr = comp[2];
      float *ycb = upsample(Cb), *ycr = upsample(Cr);
      float *yy_up = (Y.h == hmax && Y.v == vmax) ? nullptr : upsample(Y);
      if (!ycb || !ycr || ((Y.h != hmax || Y.v != vmax) && !yy_up)) {
        free(ycb); free(ycr); free(yy_up);
        return -1;
      }
      for (int y = 0; y < H; y++) {
        for (int x = 0; x < W; x++) {
          float yy = yy_up ? yy_up[(int64_t)y * W + x]
                           : Y.plane[(int64_t)y * Y.pw + x];
          float cb = ycb[(int64_t)y * W + x] - 128.0f;
          float cr = ycr[(int64_t)y * W + x] - 128.0f;
          float r = yy + 1.402f * cr;
          float g = yy - 0.344136286f * cb - 0.714136286f * cr;
          float b = yy + 1.772f * cb;
          r = r < 0 ? 0 : (r > 255 ? 255 : r);
          g = g < 0 ? 0 : (g > 255 ? 255 : g);
          b = b < 0 ? 0 : (b > 255 ? 255 : b);
          // cv::imread rounds each channel to uint8 before the
          // reference's /3 gray conversion (hesaff.cpp:140-148)
          float ri = (float)lrintf(r), gi = (float)lrintf(g),
                bi = (float)lrintf(b);
          out[(int64_t)y * W + x] = (ri + gi + bi) / 3.0f;
        }
      }
      free(ycb);
      free(ycr);
      free(yy_up);
    }
    *width = W;
    *height = H;
    return 0;
  }
};

}  // namespace

extern "C" int hesaff_decode_jpeg_gray(const uint8_t *data, int64_t size,
                                       float *out, int64_t max_pixels,
                                       int32_t *width, int32_t *height) {
  Decoder d;
  d.data = data;
  d.size = size;
  return d.parse_and_decode(out, max_pixels, width, height);
}

// Header-only scan for (width, height): lets callers size the output
// buffer before decoding.  0 on success, -1 if no supported SOF found.
extern "C" int hesaff_jpeg_dims(const uint8_t *data, int64_t size,
                                int32_t *width, int32_t *height) {
  if (size < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;
  int64_t p = 2;
  while (p + 4 <= size) {
    if (data[p] != 0xFF) return -1;
    uint8_t m = data[p + 1];
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { p += 2; continue; }
    if (m == 0xD9) return -1;
    int64_t len = ((int64_t)data[p + 2] << 8) | data[p + 3];
    if (p + 2 + len > size) return -1;
    if (m == 0xC0 || m == 0xC1 || m == 0xC2) {
      *height = (data[p + 5] << 8) | data[p + 6];
      *width = (data[p + 7] << 8) | data[p + 8];
      return (*width > 0 && *height > 0) ? 0 : -1;
    }
    if (m == 0xDA) return -1;  // scan before SOF: malformed
    p += 2 + len;
  }
  return -1;
}
