// tecodata — native data-loader core for tecogan_tpu.
//
// The reference's input pipeline runs on TensorFlow's C++ queue-runner
// threads (reference lib/dataloader.py:163-165,268-270 — PNG decode, crop
// and batch assembly all native under the TF graph). This library is the
// equivalent native substrate for the TPU framework: GIL-free threaded PNG
// decode (libpng) + crop/flip + float conversion, assembling training
// batches directly into a caller-provided buffer.
//
// It also serves streaming inference (reference main.py:253-270 reads and
// writes one PNG per frame on the python thread): td_decode_frames /
// td_encode_frames run whole frame sequences through the thread pool so
// host PNG I/O overlaps device compute instead of serializing after it.
//
// Augmentation *decisions* (window choice, movingFirstFrame offsets, flip)
// stay in Python so the RNG stream is identical to the pure-Python loader;
// this library executes the plan. C ABI for ctypes.
//
// Build: g++ -O3 -fPIC -shared -o libtecodata.so tecodata.cpp -lpng -pthread

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <list>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

// ----------------------------------------------------------------- decode
// Decode an 8-bit PNG to RGB; returns empty on failure.
struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
  bool ok() const { return h > 0; }
};

Image decode_png_rgb(const char* path) {
  Image img;
  FILE* fp = fopen(path, "rb");
  if (!fp) return img;
  // Declared BEFORE the setjmp guard: a libpng longjmp skips destructors of
  // objects constructed after setjmp, but objects already in scope at the
  // setjmp point are destroyed normally when the guard returns.
  std::vector<png_bytep> rows;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return Image{};
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // Normalize every variant to 8-bit RGB.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img.h = static_cast<int>(h);
  img.w = static_cast<int>(w);
  img.rgb.resize(static_cast<size_t>(h) * w * 3);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img.rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return img;
}

// ----------------------------------------------------------------- encode
// Write 8-bit RGB as a PNG. Settings swept on 576x720 video-like content
// (single core): level 1 + SUB filter + Z_RLE = 66 fps vs 23 fps for the
// libpng defaults, at SMALLER output (584 vs 659 KB). PNG is lossless at
// every setting, so pixel parity with the reference's cv2.imwrite holds.
bool encode_png_rgb(const char* path, const uint8_t* rgb, int h, int w) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return false;
  // Before setjmp: longjmp must not skip the vector's destructor (above).
  std::vector<png_bytep> rows;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, 1);
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_compression_strategy(png, 3 /* Z_RLE */);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  rows.resize(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(rgb + static_cast<size_t>(y) * w * 3);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return true;
}

// ------------------------------------------------------------------- pool
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

// ------------------------------------------------------------- frame cache
// LRU cache of decoded frames, shared across the pool. Plays the role of
// the reference's loadHR_batch strategy (dataloader.py:53-167: decode a
// whole scene per queue element so overlapping RNN windows share decodes)
// — redesigned as a byte-budgeted cache instead of scene-granular queue
// elements: overlapping windows across the whole epoch share decodes, not
// just windows of one queue element. Decoded images are immutable and
// handed out as shared_ptr, so readers run lock-free after lookup.
class FrameCache {
 public:
  explicit FrameCache(size_t budget_bytes) : budget_(budget_bytes) {}

  bool enabled() const { return budget_ > 0; }

  std::shared_ptr<const Image> get_or_decode(const std::string& path) {
    if (!enabled()) {
      return std::make_shared<const Image>(decode_png_rgb(path.c_str()));
    }
    {
      std::lock_guard<std::mutex> lk(mu_);
      auto it = map_.find(path);
      if (it != map_.end()) {
        lru_.splice(lru_.begin(), lru_, it->second.second);
        return it->second.first;
      }
    }
    // Decode outside the lock (two threads may race on the same path; the
    // duplicate decode is rare and harmless — last insert wins).
    auto img = std::make_shared<const Image>(decode_png_rgb(path.c_str()));
    if (!img->ok()) return img;  // never cache failures
    const size_t bytes = img->rgb.size() + path.size() + 128;
    std::lock_guard<std::mutex> lk(mu_);
    auto it = map_.find(path);
    if (it != map_.end()) {  // raced: keep the existing entry
      lru_.splice(lru_.begin(), lru_, it->second.second);
      return it->second.first;
    }
    lru_.push_front(path);
    map_.emplace(path, std::make_pair(img, lru_.begin()));
    used_ += bytes;
    while (used_ > budget_ && !lru_.empty()) {
      const std::string& victim = lru_.back();
      auto vit = map_.find(victim);
      used_ -= vit->second.first->rgb.size() + victim.size() + 128;
      map_.erase(vit);
      lru_.pop_back();
    }
    return img;
  }

 private:
  size_t budget_, used_ = 0;
  std::mutex mu_;
  std::list<std::string> lru_;  // front = most recent
  std::unordered_map<
      std::string,
      std::pair<std::shared_ptr<const Image>, std::list<std::string>::iterator>>
      map_;
};

// One sequence task: decode rnn_n frames (path-deduped), crop tar x tar at
// per-frame offsets, optional horizontal flip, write normalized float32 RGB.
struct SeqTask {
  const char* const* paths;  // rnn_n entries
  const int32_t* oy;         // rnn_n offsets
  const int32_t* ox;
  int rnn_n, tar, flip;
  float* out = nullptr;      // rnn_n * tar * tar * 3 float [0,1], or
  uint8_t* out_u8 = nullptr;  // ... raw uint8 (cheap-upload training path)
  std::atomic<int>* err;
};

void run_sequence(const SeqTask& t, FrameCache& fc) {
  std::shared_ptr<const Image> cache;
  std::string cache_path;
  for (int f = 0; f < t.rnn_n; ++f) {
    if (cache_path != t.paths[f]) {  // local dedupe (movingFirstFrame repeats)
      cache = fc.get_or_decode(t.paths[f]);
      cache_path = t.paths[f];
    }
    if (!cache->ok() || t.oy[f] < 0 || t.ox[f] < 0 ||
        t.oy[f] + t.tar > cache->h || t.ox[f] + t.tar > cache->w) {
      t.err->fetch_add(1);
      return;
    }
    const size_t plane = static_cast<size_t>(f) * t.tar * t.tar * 3;
    for (int y = 0; y < t.tar; ++y) {
      const uint8_t* src =
          cache->rgb.data() +
          (static_cast<size_t>(t.oy[f] + y) * cache->w + t.ox[f]) * 3;
      const size_t roff = plane + static_cast<size_t>(y) * t.tar * 3;
      if (t.out_u8 != nullptr) {  // raw uint8 crops (device-side /255)
        uint8_t* row = t.out_u8 + roff;
        if (!t.flip) {
          std::memcpy(row, src, static_cast<size_t>(t.tar) * 3);
        } else {  // mirror columns (reference lib/ops.py:230-235)
          for (int x = 0; x < t.tar; ++x) {
            const uint8_t* px = src + (t.tar - 1 - x) * 3;
            row[x * 3 + 0] = px[0];
            row[x * 3 + 1] = px[1];
            row[x * 3 + 2] = px[2];
          }
        }
        continue;
      }
      float* row = t.out + roff;
      if (!t.flip) {
        for (int x = 0; x < t.tar * 3; ++x) row[x] = src[x] / 255.0f;
      } else {
        for (int x = 0; x < t.tar; ++x) {
          const uint8_t* px = src + (t.tar - 1 - x) * 3;
          row[x * 3 + 0] = px[0] / 255.0f;
          row[x * 3 + 1] = px[1] / 255.0f;
          row[x * 3 + 2] = px[2] / 255.0f;
        }
      }
    }
  }
}

struct Loader {
  Loader(int threads, size_t cache_bytes)
      : pool(threads), cache(cache_bytes) {}
  ThreadPool pool;
  FrameCache cache;
};

// Completion barrier for fanned-out pool work. notify_one runs while the
// mutex is held: the waiter can only observe the final count after
// acquiring the mutex — i.e. after the last worker's notify has already
// returned — so the stack-allocated WaitGroup can never be destroyed with
// a notify still pending (the unlocked-notify pattern had that race).
class WaitGroup {
 public:
  void done() {
    std::lock_guard<std::mutex> lk(mu_);
    ++done_;
    cv_.notify_one();
  }
  void wait(int n) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_.wait(lk, [&] { return done_ == n; });
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_;
  int done_ = 0;
};

}  // namespace

extern "C" {

void* td_open(int num_threads) { return new Loader(num_threads, 0); }

// Like td_open, with an LRU decoded-frame cache of ``cache_mb`` MB shared
// by the pool (0 = off) — the loadHR_batch decode-amortization analog.
void* td_open_cached(int num_threads, int cache_mb) {
  if (cache_mb < 0) cache_mb = 0;  // negative would wrap to ~2^64: unbounded
  return new Loader(num_threads, static_cast<size_t>(cache_mb) << 20);
}

void td_close(void* handle) { delete static_cast<Loader*>(handle); }

// Read only the PNG header; returns 0 on success with *h/*w filled. Lets
// callers allocate exactly h*w*3 before td_decode instead of a worst-case
// buffer.
int td_png_dims(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 pw, ph;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &pw, &ph, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  *h = static_cast<int>(ph);
  *w = static_cast<int>(pw);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode one PNG into caller buffer (float32 RGB [0,1]); returns h<<16|w
// via out params. Returns 0 on success.
int td_decode(const char* path, float* out, int* h, int* w, int cap) {
  Image img = decode_png_rgb(path);
  if (!img.ok()) return 1;
  if (img.h * img.w * 3 > cap) return 2;
  *h = img.h;
  *w = img.w;
  const size_t n = static_cast<size_t>(img.h) * img.w * 3;
  for (size_t i = 0; i < n; ++i) out[i] = img.rgb[i] / 255.0f;
  return 0;
}

// Load a full batch of sequences in parallel.
//   paths: n_seq * rnn_n C strings (frame files; repeats allowed)
//   oy/ox: n_seq * rnn_n crop offsets; flip: n_seq flags
//   out:   n_seq * rnn_n * tar * tar * 3 float32
// Returns number of failed sequences (0 = success).
static int load_batch_impl(void* handle, const char* const* paths,
                           const int32_t* oy, const int32_t* ox,
                           const int32_t* flip, int n_seq, int rnn_n,
                           int tar, float* out, uint8_t* out_u8) {
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> err{0};
  WaitGroup wg;
  for (int s = 0; s < n_seq; ++s) {
    SeqTask t;
    t.paths = paths + static_cast<size_t>(s) * rnn_n;
    t.oy = oy + static_cast<size_t>(s) * rnn_n;
    t.ox = ox + static_cast<size_t>(s) * rnn_n;
    t.rnn_n = rnn_n;
    t.tar = tar;
    t.flip = flip[s];
    const size_t off = static_cast<size_t>(s) * rnn_n * tar * tar * 3;
    t.out = out ? out + off : nullptr;
    t.out_u8 = out_u8 ? out_u8 + off : nullptr;
    t.err = &err;
    loader->pool.submit([t, loader, &wg] {
      run_sequence(t, loader->cache);
      wg.done();
    });
  }
  wg.wait(n_seq);
  return err.load();
}

int td_load_batch(void* handle, const char* const* paths, const int32_t* oy,
                  const int32_t* ox, const int32_t* flip, int n_seq,
                  int rnn_n, int tar, float* out) {
  return load_batch_impl(handle, paths, oy, ox, flip, n_seq, rnn_n, tar, out,
                         nullptr);
}

// As td_load_batch but emits raw uint8 crops — the cheap-upload training
// path (4x less host->device / DCN traffic; /255 happens on device,
// train/trainer.py:prepare_batch).
int td_load_batch_u8(void* handle, const char* const* paths,
                     const int32_t* oy, const int32_t* ox,
                     const int32_t* flip, int n_seq, int rnn_n, int tar,
                     uint8_t* out) {
  return load_batch_impl(handle, paths, oy, ox, flip, n_seq, rnn_n, tar,
                         nullptr, out);
}

// Shared fanout for td_decode_frames / td_decode_frames_u8 (exactly one
// of out / out_u8 is non-null).
static int decode_frames_impl(void* handle, const char* const* paths, int n,
                              int* h, int* w, float* out, uint8_t* out_u8,
                              int64_t cap) {
  if (n <= 0) return 0;
  if (td_png_dims(paths[0], h, w) != 0) return -1;
  const int64_t per = static_cast<int64_t>(*h) * *w * 3;
  if (per * n > cap) return -1;
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> err{0};
  WaitGroup wg;
  const int hh = *h, ww = *w;
  for (int i = 0; i < n; ++i) {
    const char* path = paths[i];
    float* dst = out ? out + per * i : nullptr;
    uint8_t* dst_u8 = out_u8 ? out_u8 + per * i : nullptr;
    loader->pool.submit([path, dst, dst_u8, hh, ww, &err, &wg] {
      Image img = decode_png_rgb(path);
      if (!img.ok() || img.h != hh || img.w != ww) {
        err.fetch_add(1);
      } else if (dst_u8 != nullptr) {
        std::memcpy(dst_u8, img.rgb.data(),
                    static_cast<size_t>(hh) * ww * 3);
      } else {
        const size_t m = static_cast<size_t>(hh) * ww * 3;
        for (size_t j = 0; j < m; ++j) dst[j] = img.rgb[j] / 255.0f;
      }
      wg.done();
    });
  }
  wg.wait(n);
  return err.load();
}

// Decode n same-geometry PNG frames in parallel into a contiguous
// (n, h, w, 3) float32 [0, 1] buffer (streaming-inference input,
// reference dataloader.py:11-50). h/w are taken from the first frame's
// header; frames with different geometry count as errors. ``cap`` is the
// caller buffer's float capacity. Returns the number of failed frames,
// or -1 when the header read / capacity check fails.
int td_decode_frames(void* handle, const char* const* paths, int n, int* h,
                     int* w, float* out, int64_t cap) {
  return decode_frames_impl(handle, paths, n, h, w, out, nullptr, cap);
}

// Same as td_decode_frames but writes raw uint8 RGB — the cheap-upload
// path (device-side /255) needs no float conversion, and the uint8 buffer
// is 4x smaller.
int td_decode_frames_u8(void* handle, const char* const* paths, int n, int* h,
                        int* w, uint8_t* out, int64_t cap) {
  return decode_frames_impl(handle, paths, n, h, w, nullptr, out, cap);
}

// Encode n uint8 RGB frames ((n, h, w, 3) contiguous) to PNG files in
// parallel (the reference's per-frame save loop, main.py:262-269).
// Returns the number of failed frames.
int td_encode_frames(void* handle, const char* const* paths,
                     const uint8_t* rgb, int n, int h, int w) {
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> err{0};
  WaitGroup wg;
  const size_t per = static_cast<size_t>(h) * w * 3;
  for (int i = 0; i < n; ++i) {
    const char* path = paths[i];
    const uint8_t* src = rgb + per * i;
    loader->pool.submit([path, src, h, w, &err, &wg] {
      if (!encode_png_rgb(path, src, h, w)) err.fetch_add(1);
      wg.done();
    });
  }
  wg.wait(n);
  return err.load();
}

}  // extern "C"
