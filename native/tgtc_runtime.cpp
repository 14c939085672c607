// tgtc native runtime: threaded image IO for the artifact-heavy phases.
//
// The bulk phases (geometry dump, stylized renders — see
// tgtc/train/geometry.py, tgtc/train/render_style.py) write hundreds of
// full-resolution PNGs; doing that with PIL on the Python thread serializes
// host encode behind device compute. This library provides:
//
//   * a zlib-based PNG encoder (8-bit RGB/gray, Paeth-free fast path)
//   * box-filter image downsampling (the LLFF "minify" step — replaces the
//     reference's ImageMagick subprocess, /root/reference/load_llff.py:43-49)
//   * a worker thread pool with submit/wait semantics so Python hands off a
//     frame and immediately returns to driving the TPU.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------ PNG

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, out.data() + start, static_cast<uInt>(len + 4));
  put_be32(out, crc);
}

// Encode h*w*c (c in {1,3,4}) 8-bit image into an in-memory PNG.
bool encode_png(const uint8_t* img, int h, int w, int c,
                std::vector<uint8_t>& out) {
  if (c != 1 && c != 3 && c != 4) return false;
  out.clear();
  static const uint8_t sig[8] = {137, 'P', 'N', 'G', 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);

  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;  // bit depth
  ihdr[9] = (c == 1) ? 0 : (c == 3 ? 2 : 6);  // color type
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);

  // raw scanlines with filter byte 0 (favor encode speed over ratio; the
  // artifacts are intermediate data, not deliverables)
  const size_t stride = static_cast<size_t>(w) * c;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (int y = 0; y < h; ++y) {
    raw[y * (stride + 1)] = 0;
    std::memcpy(&raw[y * (stride + 1) + 1], img + y * stride, stride);
  }

  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 3) != Z_OK)
    return false;
  put_chunk(out, "IDAT", z.data(), bound);
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(data.data(), 1, data.size(), f);
  std::fclose(f);
  return n == data.size();
}

// ------------------------------------------------------------ thread pool

class Pool {
 public:
  explicit Pool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
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
      q_.push_back(std::move(fn));
      ++pending_;
    }
    cv_.notify_one();
  }
  void wait_all() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
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
        q_.pop_front();
      }
      fn();
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }
  std::vector<std::thread> workers_;
  std::deque<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  int pending_;
};

Pool* pool() {
  static Pool p(std::max(2u, std::thread::hardware_concurrency() / 2));
  return &p;
}

std::atomic<long> g_errors{0};

}  // namespace

extern "C" {

// Synchronous PNG write. Returns 0 on success.
int tgtc_write_png(const char* path, const uint8_t* img, int h, int w, int c) {
  std::vector<uint8_t> out;
  if (!encode_png(img, h, w, c, out)) return 1;
  return write_file(path, out) ? 0 : 2;
}

// Async PNG write: copies the buffer, encodes + writes on the pool.
void tgtc_write_png_async(const char* path, const uint8_t* img, int h, int w,
                          int c) {
  std::string p(path);
  std::vector<uint8_t> copy(img, img + static_cast<size_t>(h) * w * c);
  pool()->submit([p = std::move(p), copy = std::move(copy), h, w, c] {
    std::vector<uint8_t> out;
    if (!encode_png(copy.data(), h, w, c, out) || !write_file(p.c_str(), out))
      ++g_errors;
  });
}

// Block until all queued writes finish; returns accumulated error count.
long tgtc_wait_writes(void) {
  pool()->wait_all();
  return g_errors.exchange(0);
}

// Box-filter (area-average) downsample by integer factor, uint8 HWC.
void tgtc_resize_box(const uint8_t* src, int sh, int sw, int c, int factor,
                     uint8_t* dst) {
  int dh = sh / factor, dw = sw / factor;
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        unsigned acc = 0;
        for (int dy = 0; dy < factor; ++dy)
          for (int dx = 0; dx < factor; ++dx)
            acc += src[((y * factor + dy) * sw + (x * factor + dx)) * c + ch];
        dst[(y * dw + x) * c + ch] =
            static_cast<uint8_t>(acc / (factor * factor));
      }
    }
  }
}

}  // extern "C"
