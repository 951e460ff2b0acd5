// Native scan decoding + prefetch runtime for the TPU LiDAR-odometry host.
//
// Counterpart of the native dataset-decoding layer the reference gets from
// mrpt/mola_input_* (reference apps/mola-lidar-odometry-cli.cpp:163-322):
// the TPU engine consumes padded fixed-capacity point buffers, and on a
// single-core host the decode + vertical-angle correction + azimuth
// timestamp model + padding is the hot host-side path. This library does
// that in C++ with a background prefetch thread so file decode overlaps
// device compute.
//
// Exposed as a plain C ABI consumed via ctypes (native/binding.py).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct DecodedScan {
  std::vector<float> xyz;        // capacity*3, padded with zeros
  std::vector<float> intensity;  // capacity
  std::vector<float> times;      // capacity
  int32_t n_points = 0;          // valid prefix length
  int32_t status = 0;            // 0 ok, <0 error
};

// Decode one KITTI/MulRan-style .bin (N x 4 float32: x y z intensity) into a
// padded buffer, optionally applying the Deschaud-2018 vertical-angle
// correction and the spinning-sensor azimuth timestamp model.
int decode_bin_into(const char* path, int32_t capacity, float vert_corr_rad,
                    float spin_period, DecodedScan& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int32_t n_file = static_cast<int32_t>(bytes / (4 * sizeof(float)));
  const int32_t n = n_file < capacity ? n_file : capacity;

  std::vector<float> raw(static_cast<size_t>(n) * 4);
  const size_t got = std::fread(raw.data(), sizeof(float), raw.size(), f);
  std::fclose(f);
  if (got != raw.size()) return -2;

  out.xyz.assign(static_cast<size_t>(capacity) * 3, 0.0f);
  out.intensity.assign(static_cast<size_t>(capacity), 0.0f);
  out.times.assign(static_cast<size_t>(capacity), 0.0f);

  const float two_pi = 6.28318530717958647692f;
  for (int32_t i = 0; i < n; ++i) {
    float x = raw[4 * i + 0], y = raw[4 * i + 1], z = raw[4 * i + 2];
    if (vert_corr_rad != 0.0f) {
      const float rxy = std::sqrt(x * x + y * y);
      const float el = std::atan2(z, rxy) + vert_corr_rad;
      const float rng = std::sqrt(x * x + y * y + z * z);
      const float az = std::atan2(y, x);
      const float cel = std::cos(el);
      x = rng * cel * std::cos(az);
      y = rng * cel * std::sin(az);
      z = rng * std::sin(el);
    }
    out.xyz[3 * i + 0] = x;
    out.xyz[3 * i + 1] = y;
    out.xyz[3 * i + 2] = z;
    out.intensity[i] = raw[4 * i + 3];
    if (spin_period > 0.0f)
      out.times[i] = std::atan2(y, x) / two_pi * spin_period;
  }
  out.n_points = n;
  out.status = 0;
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetcher: a worker thread decodes files ahead of the consumer, bounded
// by a lookahead window (the moral equivalent of the reference's
// read_ahead_length dataset option).
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::vector<std::string> paths;
  int32_t capacity = 0;
  float vert_corr = 0.0f;
  float spin_period = 0.1f;
  size_t lookahead = 4;

  std::deque<DecodedScan> ready;  // decoded, not yet consumed
  size_t next_decode = 0;         // next index the worker will decode
  size_t next_take = 0;           // next index the consumer will take

  std::mutex mtx;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};

  void run() {
    while (true) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mtx);
        cv_space.wait(lk, [&] {
          return stop || (next_decode < paths.size() && ready.size() < lookahead);
        });
        if (stop || next_decode >= paths.size()) return;
        idx = next_decode++;
      }
      DecodedScan s;
      const int rc =
          decode_bin_into(paths[idx].c_str(), capacity, vert_corr, spin_period, s);
      if (rc != 0) s.status = rc;
      {
        std::lock_guard<std::mutex> lk(mtx);
        ready.push_back(std::move(s));
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// One-shot decode. Returns the number of valid points, or <0 on error.
// Output buffers must hold capacity*3 / capacity / capacity floats.
int32_t mola_tpu_decode_bin(const char* path, int32_t capacity,
                            float vert_corr_rad, float spin_period,
                            float* out_xyz, float* out_intensity,
                            float* out_times) {
  DecodedScan s;
  const int rc = decode_bin_into(path, capacity, vert_corr_rad, spin_period, s);
  if (rc != 0) return rc;
  std::memcpy(out_xyz, s.xyz.data(), s.xyz.size() * sizeof(float));
  std::memcpy(out_intensity, s.intensity.data(),
              s.intensity.size() * sizeof(float));
  std::memcpy(out_times, s.times.data(), s.times.size() * sizeof(float));
  return s.n_points;
}

// Prefetcher lifecycle. paths is a '\n'-joined list.
void* mola_tpu_prefetch_open(const char* paths_joined, int32_t capacity,
                             float vert_corr_rad, float spin_period,
                             int32_t lookahead) {
  auto* p = new Prefetcher();
  const char* s = paths_joined;
  while (*s) {
    const char* e = std::strchr(s, '\n');
    if (!e) e = s + std::strlen(s);
    if (e > s) p->paths.emplace_back(s, e - s);
    s = (*e) ? e + 1 : e;
  }
  p->capacity = capacity;
  p->vert_corr = vert_corr_rad;
  p->spin_period = spin_period;
  p->lookahead = lookahead > 0 ? static_cast<size_t>(lookahead) : 4;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocking take of the next decoded scan (in order). Returns point count,
// <0 on decode error, or -100 when the sequence is exhausted.
int32_t mola_tpu_prefetch_next(void* handle, float* out_xyz,
                               float* out_intensity, float* out_times) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mtx);
  if (p->next_take >= p->paths.size()) return -100;
  p->cv_ready.wait(lk, [&] { return !p->ready.empty(); });
  DecodedScan s = std::move(p->ready.front());
  p->ready.pop_front();
  p->next_take++;
  lk.unlock();
  p->cv_space.notify_one();
  if (s.status != 0) return s.status;
  std::memcpy(out_xyz, s.xyz.data(), s.xyz.size() * sizeof(float));
  std::memcpy(out_intensity, s.intensity.data(),
              s.intensity.size() * sizeof(float));
  std::memcpy(out_times, s.times.data(), s.times.size() * sizeof(float));
  return s.n_points;
}

void mola_tpu_prefetch_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mtx);
    p->stop = true;
  }
  p->cv_space.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

// Fast float32 xyz blob writer (simplemap lazy-load externalization path,
// reference LidarOdometry.cpp:2151-2214).
int32_t mola_tpu_write_f32(const char* path, const float* data, int64_t count) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const size_t wrote = std::fwrite(data, sizeof(float), count, f);
  std::fclose(f);
  return wrote == static_cast<size_t>(count) ? 0 : -2;
}

}  // extern "C"
