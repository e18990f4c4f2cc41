// hesaff_tpu native host runtime: multi-threaded prefetching image
// loader.
//
// The fleet path (hesaff_tpu/utils/fleet.py) feeds the TPU from a
// Python loop; decoding the next batch on the host serializes with
// device compute.  This loader runs a C++ thread pool that reads,
// decodes (PNM/PNG via the decoders in hesaff_io.cpp), grays, and
// edge-pads images AHEAD of the consumer, delivering them strictly in
// input order through a bounded ring so memory stays O(queue).  The
// reference's host shell is C++ (hesaff.cpp:133-180: imread + gray
// convert); this is its fleet-scale equivalent.
//
// C ABI (consumed via ctypes, hesaff_tpu/native.py):
//   hesaff_loader_create(paths, n, threads, pad_multiple, queue_cap)
//   hesaff_loader_next(L, &wp, &hp, &ow, &oh) -> 0 ok / 1 decode
//       failed (caller falls back for this path) / -1 end of stream
//   hesaff_loader_fetch(L, out_or_null)       -> copy padded image
//       (hp x wp floats) into out and advance the ring
//   hesaff_loader_destroy(L)
//
// Build: compiled into libhesaff_io.so (see native.py) with -pthread.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int hesaff_decode_pnm_gray(const uint8_t *data, int64_t size, float *out,
                           int64_t max_pixels, int32_t *width,
                           int32_t *height);
int hesaff_decode_png_gray(const uint8_t *data, int64_t size, float *out,
                           int64_t max_pixels, int32_t *width,
                           int32_t *height);
int hesaff_decode_jpeg_gray(const uint8_t *data, int64_t size, float *out,
                            int64_t max_pixels, int32_t *width,
                            int32_t *height);
int hesaff_jpeg_dims(const uint8_t *data, int64_t size, int32_t *width,
                     int32_t *height);
}

namespace {

struct Slot {
  std::vector<float> pix;  // padded (hp x wp) image
  int32_t wp = 0, hp = 0;  // padded dims
  int32_t ow = 0, oh = 0;  // original dims
  int rc = 1;              // 0 ok, 1 decode failure
  bool ready = false;
};

struct Loader {
  std::vector<std::string> paths;
  int pad_multiple;
  int queue_cap;
  std::vector<Slot> ring;          // queue_cap slots, slot = index % cap
  std::atomic<int64_t> next_claim{0};
  int64_t next_deliver = 0;        // consumer cursor (under mu)
  bool stop = false;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for its slot
  std::condition_variable cv_space;  // workers wait for ring space
  std::vector<std::thread> workers;
};

int64_t round_up(int64_t v, int64_t m) { return (v + m - 1) / m * m; }

// Read + decode one file into a gray float image; 0 on success.
int decode_file(const std::string &path, std::vector<float> &pix,
                int32_t *w, int32_t *h) {
  FILE *f = fopen(path.c_str(), "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  const long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size <= 2) { fclose(f); return 1; }
  std::vector<uint8_t> data((size_t)size);
  const size_t got = fread(data.data(), 1, (size_t)size, f);
  fclose(f);
  if ((long)got != size) return 1;

  if (data[0] == 'P' && (data[1] == '5' || data[1] == '6')) {
    // file size in bytes bounds the pixel count for binary PNM
    pix.resize((size_t)size);
    return hesaff_decode_pnm_gray(data.data(), size, pix.data(), size,
                                  w, h) == 0 ? 0 : 1;
  }
  if (size > 24 && data[0] == 0x89 && data[1] == 'P') {
    const uint64_t wd = ((uint64_t)data[16] << 24) | (data[17] << 16) |
                        (data[18] << 8) | data[19];
    const uint64_t ht = ((uint64_t)data[20] << 24) | (data[21] << 16) |
                        (data[22] << 8) | data[23];
    // 2^27 px (512 MB of floats) bounds hostile-header allocations
    if (wd == 0 || ht == 0 || wd * ht > (1ull << 27)) return 1;
    pix.resize((size_t)(wd * ht));
    return hesaff_decode_png_gray(data.data(), size, pix.data(),
                                  (int64_t)(wd * ht), w, h) == 0 ? 0 : 1;
  }
  if (data[0] == 0xFF && data[1] == 0xD8) {
    int32_t wd = 0, ht = 0;
    if (hesaff_jpeg_dims(data.data(), size, &wd, &ht) != 0) return 1;
    if ((int64_t)wd * ht > (1ll << 27)) return 1;
    pix.resize((size_t)wd * ht);
    return hesaff_decode_jpeg_gray(data.data(), size, pix.data(),
                                   (int64_t)wd * ht, w, h) == 0 ? 0 : 1;
  }
  return 1;  // unknown container: consumer falls back (PIL path)
}

// Edge-pad (replicate last row/col) up to multiples of pad_multiple,
// matching utils/fleet.pad_to_bucket's np.pad(mode="edge").
void edge_pad(const std::vector<float> &src, int32_t w, int32_t h,
              int pad_multiple, Slot &slot) {
  const int64_t wp = round_up(w, pad_multiple);
  const int64_t hp = round_up(h, pad_multiple);
  slot.ow = w;
  slot.oh = h;
  slot.wp = (int32_t)wp;
  slot.hp = (int32_t)hp;
  if (wp == w && hp == h) {
    // src may be oversized (PNM decode buffers are bounded by file
    // size, not w*h) — copy exactly w*h so fetch()'s memcpy of
    // slot.pix.size() floats matches the caller's (h, w) buffer
    slot.pix.assign(src.begin(), src.begin() + (int64_t)w * h);
    return;
  }
  slot.pix.assign((size_t)(wp * hp), 0.0f);
  for (int64_t r = 0; r < hp; r++) {
    const int64_t sr = r < h ? r : h - 1;
    float *dst = slot.pix.data() + r * wp;
    memcpy(dst, src.data() + sr * w, (size_t)w * sizeof(float));
    const float edge = dst[w - 1];
    for (int64_t c = w; c < wp; c++) dst[c] = edge;
  }
}

void worker(Loader *L) {
  std::vector<float> pix;
  for (;;) {
    const int64_t i = L->next_claim.fetch_add(1);
    if (i >= (int64_t)L->paths.size()) return;
    // wait for ring space BEFORE decoding so in-flight memory stays
    // bounded by queue_cap + one image per thread
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_space.wait(lk, [&] {
        return L->stop || i < L->next_deliver + L->queue_cap;
      });
      if (L->stop) return;
    }
    int32_t w = 0, h = 0;
    Slot tmp;
    // decode failures of ANY kind (parse error, hostile header, alloc
    // failure) must surface as a per-image rc, not kill the process —
    // an exception escaping a thread entry calls std::terminate
    try {
      tmp.rc = decode_file(L->paths[(size_t)i], pix, &w, &h);
      if (tmp.rc == 0) edge_pad(pix, w, h, L->pad_multiple, tmp);
    } catch (...) {
      tmp.rc = 1;
      tmp.pix.clear();
    }
    tmp.ready = true;
    Slot &slot = L->ring[(size_t)(i % L->queue_cap)];
    {
      std::unique_lock<std::mutex> lk(L->mu);
      if (L->stop) return;
      slot = std::move(tmp);
      L->cv_ready.notify_all();
    }
  }
}

}  // namespace

extern "C" {

void *hesaff_loader_create(const char *const *paths, int64_t n,
                           int threads, int pad_multiple, int queue_cap) {
  if (n < 0 || threads < 1 || pad_multiple < 1 || queue_cap < 1)
    return nullptr;
  Loader *L = new Loader();
  L->paths.reserve((size_t)n);
  for (int64_t i = 0; i < n; i++) L->paths.emplace_back(paths[i]);
  L->pad_multiple = pad_multiple;
  L->queue_cap = queue_cap;
  L->ring.resize((size_t)queue_cap);
  const int nt = threads < (int)n ? threads : (n > 0 ? (int)n : 1);
  for (int t = 0; t < nt; t++) L->workers.emplace_back(worker, L);
  return L;
}

int hesaff_loader_next(void *handle, int32_t *wp, int32_t *hp,
                       int32_t *ow, int32_t *oh) {
  Loader *L = (Loader *)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_deliver >= (int64_t)L->paths.size()) return -1;
  Slot &slot = L->ring[(size_t)(L->next_deliver % L->queue_cap)];
  L->cv_ready.wait(lk, [&] { return slot.ready; });
  *wp = slot.wp;
  *hp = slot.hp;
  *ow = slot.ow;
  *oh = slot.oh;
  return slot.rc == 0 ? 0 : 1;
}

int hesaff_loader_fetch(void *handle, float *out) {
  Loader *L = (Loader *)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_deliver >= (int64_t)L->paths.size()) return -1;
  Slot &slot = L->ring[(size_t)(L->next_deliver % L->queue_cap)];
  if (!slot.ready) return -2;  // protocol error: next() not called
  if (out && slot.rc == 0)
    memcpy(out, slot.pix.data(), slot.pix.size() * sizeof(float));
  slot.ready = false;
  slot.rc = 1;
  slot.pix.clear();
  slot.pix.shrink_to_fit();
  L->next_deliver++;
  L->cv_space.notify_all();
  return 0;
}

void hesaff_loader_destroy(void *handle) {
  Loader *L = (Loader *)handle;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
    L->cv_space.notify_all();
  }
  for (auto &t : L->workers) t.join();
  delete L;
}

}  // extern "C"
