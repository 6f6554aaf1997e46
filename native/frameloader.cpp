// Native frame loader + prefetcher for the TPU SLAM engine.
//
// Reference analog: cuSIFT's host-side C++ runtime — the CudaImage
// container's Allocate/Download path and the demo's OpenCV image loading
// (SURVEY.md C3, C16).  On TPU the device transfer is jax.device_put; what
// remains host-side and latency-critical is file I/O + decode + format
// conversion, which this module does natively with a worker pool and a
// bounded prefetch ring so the accelerator never waits on the disk.
//
// Formats: PGM P5 (8/16-bit), PPM P6 (8-bit, converted to grayscale), and
// raw .npy float32/uint8/uint16 2-D arrays.  Output is always float32:
// grayscale in [0,1] or depth scaled by a caller-provided factor.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   fl_open(paths, n_paths, n_threads, queue_depth, scale) -> handle
//   fl_next(handle, out_buf, capacity, &h, &w) -> index or <0 when done
//   fl_close(handle)
//   fl_decode(path, out_buf, capacity, &h, &w, scale) -> 0 ok (one-shot)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  int index = -1;
  int h = 0, w = 0;
  std::vector<float> data;
  bool ok = false;
};

// ---------- decoding ----------

bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) { std::fclose(f); return false; }
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

// Skip PNM whitespace + comments; returns next token start or npos.
size_t pnm_token(const std::vector<uint8_t>& b, size_t pos, std::string& tok) {
  const size_t n = b.size();
  while (pos < n) {
    if (b[pos] == '#') { while (pos < n && b[pos] != '\n') pos++; }
    else if (isspace(b[pos])) pos++;
    else break;
  }
  tok.clear();
  while (pos < n && !isspace(b[pos]) && b[pos] != '#') tok.push_back(b[pos++]);
  return pos;
}

bool decode_pnm(const std::vector<uint8_t>& b, float scale, Frame& f) {
  if (b.size() < 10 || b[0] != 'P') return false;
  const char kind = static_cast<char>(b[1]);
  if (kind != '5' && kind != '6') return false;
  std::string tok;
  size_t pos = 2;
  pos = pnm_token(b, pos, tok); int w = std::atoi(tok.c_str());
  pos = pnm_token(b, pos, tok); int h = std::atoi(tok.c_str());
  pos = pnm_token(b, pos, tok); int maxv = std::atoi(tok.c_str());
  if (w <= 0 || h <= 0 || maxv <= 0) return false;
  pos++;  // single whitespace after maxval
  const int ch = (kind == '6') ? 3 : 1;
  const int bytes = (maxv > 255) ? 2 : 1;
  const size_t need = static_cast<size_t>(w) * h * ch * bytes;
  if (b.size() < pos + need) return false;
  f.h = h; f.w = w;
  f.data.resize(static_cast<size_t>(w) * h);
  const uint8_t* p = b.data() + pos;
  const float inv = (scale > 0.f) ? scale : 1.0f / static_cast<float>(maxv);
  // 16-bit samples are big-endian per the PNM spec
  auto sample = [&](size_t si) -> float {
    if (bytes == 2) return static_cast<float>((p[2 * si] << 8) | p[2 * si + 1]);
    return static_cast<float>(p[si]);
  };
  for (size_t i = 0; i < static_cast<size_t>(w) * h; i++) {
    float v;
    if (ch == 3) {  // PPM -> Rec.601 luminance (8- or 16-bit samples)
      v = 0.299f * sample(3 * i) + 0.587f * sample(3 * i + 1)
          + 0.114f * sample(3 * i + 2);
    } else {
      v = sample(i);
    }
    f.data[i] = v * inv;
  }
  return true;
}

bool decode_npy(const std::vector<uint8_t>& b, float scale, Frame& f) {
  if (b.size() < 10 || std::memcmp(b.data(), "\x93NUMPY", 6) != 0) return false;
  const int hlen = b[8] | (b[9] << 8);
  const std::string hdr(reinterpret_cast<const char*>(b.data() + 10), hlen);
  auto find_val = [&](const std::string& key) -> std::string {
    size_t p = hdr.find(key);
    if (p == std::string::npos) return "";
    p = hdr.find(':', p);
    size_t e = hdr.find(',', p);
    return hdr.substr(p + 1, e - p - 1);
  };
  const std::string descr = find_val("'descr'");
  // little-endian host decode only: '>f4'-style big-endian payloads would
  // reinterpret byte-swapped and normalise into plausible-looking garbage
  if (descr.find('>') != std::string::npos) return false;
  const bool fortran = find_val("'fortran_order'").find("True") != std::string::npos;
  if (fortran) return false;
  size_t sp = hdr.find("'shape'");
  sp = hdr.find('(', sp);
  size_t ep = hdr.find(')', sp);
  int h = 0, w = 0;
  if (std::sscanf(hdr.substr(sp, ep - sp + 1).c_str(), "(%d, %d)", &h, &w) != 2)
    return false;
  const size_t npix = static_cast<size_t>(h) * w;
  const uint8_t* p = b.data() + 10 + hlen;
  const size_t avail = b.size() - 10 - hlen;
  f.h = h; f.w = w;
  f.data.resize(npix);
  // scale == 0 means "normalise by the dtype's max" (the documented
  // contract); floats pass through unscaled in that case
  if (descr.find("f4") != std::string::npos && avail >= npix * 4) {
    const float s = (scale > 0.f) ? scale : 1.0f;
    const float* fp = reinterpret_cast<const float*>(p);
    for (size_t i = 0; i < npix; i++) f.data[i] = fp[i] * s;
  } else if (descr.find("u2") != std::string::npos && avail >= npix * 2) {
    const float s = (scale > 0.f) ? scale : 1.0f / 65535.0f;
    const uint16_t* up = reinterpret_cast<const uint16_t*>(p);
    for (size_t i = 0; i < npix; i++) f.data[i] = up[i] * s;
  } else if (descr.find("u1") != std::string::npos && avail >= npix) {
    const float s = (scale > 0.f) ? scale : 1.0f / 255.0f;
    for (size_t i = 0; i < npix; i++) f.data[i] = p[i] * s;
  } else {
    return false;
  }
  return true;
}

bool decode_path(const std::string& path, float scale, Frame& f) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return false;
  if (decode_pnm(buf, scale, f)) return true;
  if (decode_npy(buf, scale, f)) return true;
  return false;
}

// ---------- prefetcher ----------

struct Loader {
  std::vector<std::string> paths;
  float scale = 0.f;
  size_t queue_depth = 4;
  std::atomic<int> next_to_fetch{0};
  int next_to_emit = 0;
  std::map<int, Frame> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker() {
    for (;;) {
      if (stop.load()) return;
      int idx = next_to_fetch.fetch_add(1);
      if (idx >= static_cast<int>(paths.size())) return;
      Frame f;
      f.index = idx;
      f.ok = decode_path(paths[idx], scale, f);
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || ready.size() < queue_depth ||
               idx < next_to_emit + static_cast<int>(queue_depth);
      });
      if (stop.load()) return;
      ready.emplace(idx, std::move(f));
      cv_ready.notify_all();
    }
  }

  bool next(Frame& out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_to_emit >= static_cast<int>(paths.size())) return false;
    cv_ready.wait(lk, [&] {
      return stop.load() || ready.count(next_to_emit) > 0;
    });
    if (stop.load()) return false;
    out = std::move(ready[next_to_emit]);
    ready.erase(next_to_emit);
    next_to_emit++;
    cv_space.notify_all();
    return true;
  }
};

std::mutex g_handles_mu;
std::map<int, std::unique_ptr<Loader>> g_handles;
int g_next_handle = 1;

}  // namespace

extern "C" {

int fl_open(const char** paths, int n_paths, int n_threads, int queue_depth,
            float scale) {
  auto ld = std::make_unique<Loader>();
  for (int i = 0; i < n_paths; i++) ld->paths.emplace_back(paths[i]);
  ld->scale = scale;
  ld->queue_depth = queue_depth > 0 ? queue_depth : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; t++)
    ld->workers.emplace_back(&Loader::worker, ld.get());
  std::lock_guard<std::mutex> lk(g_handles_mu);
  int h = g_next_handle++;
  g_handles[h] = std::move(ld);
  return h;
}

// Returns the frame index (>= 0) or -1 when the stream is exhausted,
// -2 on decode failure, -3 if the buffer is too small (h/w still set).
int fl_next(int handle, float* out, int64_t capacity, int* h, int* w) {
  Loader* ld;
  {
    std::lock_guard<std::mutex> lk(g_handles_mu);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return -2;
    ld = it->second.get();
  }
  Frame f;
  if (!ld->next(f)) return -1;
  *h = f.h;
  *w = f.w;
  if (!f.ok) return -2;
  if (static_cast<int64_t>(f.data.size()) > capacity) return -3;
  std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  return f.index;
}

void fl_close(int handle) {
  std::unique_ptr<Loader> ld;
  {
    std::lock_guard<std::mutex> lk(g_handles_mu);
    auto it = g_handles.find(handle);
    if (it == g_handles.end()) return;
    ld = std::move(it->second);
    g_handles.erase(it);
  }
  ld->stop.store(true);
  ld->cv_ready.notify_all();
  ld->cv_space.notify_all();
  for (auto& t : ld->workers) t.join();
}

int fl_decode(const char* path, float* out, int64_t capacity, int* h, int* w,
              float scale) {
  Frame f;
  if (!decode_path(path, scale, f)) return -2;
  *h = f.h;
  *w = f.w;
  if (static_cast<int64_t>(f.data.size()) > capacity) return -3;
  std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  return 0;
}

}  // extern "C"
