// Native frame-loading runtime: threaded RGB-D prefetcher with an in-house
// 16-bit PNG depth decoder.
//
// Role: the native counterpart of the reference's data layer
// (`utils/camera_utils.py` + PIL decoding in `scene/dataset_readers.py`),
// which decodes every frame synchronously on the Python thread. Here a C++
// worker pool decodes frames AHEAD of the SLAM loop so host IO never stalls
// the device:
//
//   loader = FrameLoader(paths); loader.prefetch(window);
//   frame  = loader.get(i);   // usually already decoded
//
// Depth PNGs (the Replica/TUM 16-bit grayscale format) are decoded natively
// (zlib inflate + PNG unfilter); color JPEGs go through the Python side
// (libjpeg headers are not in this image).
//
// Exposed through ctypes (see dqo_map_tpu/data/native_loader.py).

#include <zlib.h>
#include <set>
#include <cstdlib>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct DepthImage {
  uint32_t width = 0;
  uint32_t height = 0;
  uint16_t bit_depth = 0;
  std::vector<uint16_t> pixels;  // row-major, native endian
  bool ok = false;
  std::string error;
};

uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Minimal PNG decoder for grayscale (color type 0) 8/16-bit images —
// exactly the depth-map format Replica/TUM ship. No interlacing.
DepthImage decode_depth_png(const std::string& path) {
  DepthImage img;
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    img.error = "cannot open " + path;
    return img;
  }
  std::vector<uint8_t> data((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (data.size() < 8 || std::memcmp(data.data(), kSig, 8) != 0) {
    img.error = "not a png";
    return img;
  }
  size_t pos = 8;
  std::vector<uint8_t> idat;
  uint8_t color_type = 255, bit_depth = 0, interlace = 0;
  while (pos + 8 <= data.size()) {
    uint32_t len = read_be32(&data[pos]);
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const uint8_t* payload = &data[pos + 8];
    if (pos + 12 + len > data.size()) break;
    if (std::memcmp(type, "IHDR", 4) == 0) {
      img.width = read_be32(payload);
      img.height = read_be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (color_type != 0 || (bit_depth != 8 && bit_depth != 16) || interlace) {
    img.error = "unsupported png (need non-interlaced grayscale 8/16-bit)";
    return img;
  }
  img.bit_depth = bit_depth;
  const size_t bpp = bit_depth / 8;
  const size_t stride = img.width * bpp;
  std::vector<uint8_t> raw((stride + 1) * img.height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) {
    img.error = "zlib inflate failed";
    return img;
  }
  // unfilter
  std::vector<uint8_t> out(stride * img.height);
  for (uint32_t y = 0; y < img.height; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &out[y * stride];
    const uint8_t* prev = y ? &out[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default:
          img.error = "bad filter";
          return img;
      }
      dst[x] = uint8_t(v);
    }
  }
  img.pixels.resize(size_t(img.width) * img.height);
  if (bit_depth == 16) {
    for (size_t i = 0; i < img.pixels.size(); ++i)
      img.pixels[i] = (uint16_t(out[2 * i]) << 8) | out[2 * i + 1];  // BE
  } else {
    for (size_t i = 0; i < img.pixels.size(); ++i) img.pixels[i] = out[i];
  }
  img.ok = true;
  return img;
}

// ---------------------------------------------------------------------------
// Prefetching loader: worker pool + LRU-ish cache keyed by frame index.
// ---------------------------------------------------------------------------

class FrameLoader {
 public:
  FrameLoader(std::vector<std::string> paths, int n_workers, int cache_cap)
      : paths_(std::move(paths)), cache_cap_(cache_cap) {
    for (int i = 0; i < n_workers; ++i)
      workers_.emplace_back([this] { worker(); });
  }

  ~FrameLoader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void prefetch(int start, int count) {
    std::lock_guard<std::mutex> lk(mu_);
    for (int i = start; i < start + count && i < int(paths_.size()); ++i) {
      if (cache_.count(i) || pending_.count(i)) continue;
      pending_.insert(i);
      queue_.push_back(i);
    }
    cv_.notify_all();
  }

  // Blocks until frame i is decoded; returns a reference kept alive until
  // the cache evicts it (the Python side copies immediately).
  const DepthImage* get(int i) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!cache_.count(i) && !pending_.count(i)) {
      pending_.insert(i);
      queue_.push_front(i);  // priority: demand-miss
      cv_.notify_one();
    }
    done_cv_.wait(lk, [&] { return cache_.count(i) > 0; });
    return &cache_[i];
  }

  void evict_below(int i) {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto it = cache_.begin(); it != cache_.end();)
      it = (it->first < i) ? cache_.erase(it) : ++it;
  }

  int size() const { return int(paths_.size()); }

 private:
  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        idx = queue_.front();
        queue_.pop_front();
      }
      DepthImage img = decode_depth_png(paths_[idx]);
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (int(cache_.size()) >= cache_cap_ && !cache_.empty())
          cache_.erase(cache_.begin());
        cache_[idx] = std::move(img);
        pending_.erase(idx);
      }
      done_cv_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int cache_cap_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<int> queue_;
  std::unordered_map<int, DepthImage> cache_;
  std::set<int> pending_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

void* fl_create(const char** paths, int n, int workers, int cache_cap) {
  std::vector<std::string> v(paths, paths + n);
  return new FrameLoader(std::move(v), workers, cache_cap);
}

void fl_destroy(void* h) { delete static_cast<FrameLoader*>(h); }

void fl_prefetch(void* h, int start, int count) {
  static_cast<FrameLoader*>(h)->prefetch(start, count);
}

// Returns 1 on success. Caller passes a buffer of at least w*h uint16.
int fl_get(void* h, int i, uint16_t* out, int* w, int* hgt) {
  const DepthImage* img = static_cast<FrameLoader*>(h)->get(i);
  if (!img->ok) return 0;
  *w = int(img->width);
  *hgt = int(img->height);
  std::memcpy(out, img->pixels.data(), img->pixels.size() * 2);
  return 1;
}

// One-shot decode without the loader (utility/testing).
int decode_depth(const char* path, uint16_t* out, int max_pixels, int* w,
                 int* hgt) {
  DepthImage img = decode_depth_png(path);
  if (!img.ok) return 0;
  if (int(img.pixels.size()) > max_pixels) return -int(img.pixels.size());
  *w = int(img.width);
  *hgt = int(img.height);
  std::memcpy(out, img.pixels.data(), img.pixels.size() * 2);
  return 1;
}

void fl_evict_below(void* h, int i) {
  static_cast<FrameLoader*>(h)->evict_below(i);
}

}  // extern "C"
