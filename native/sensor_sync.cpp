// Native sensor runtime: lock-free ingestion + time-synchronized interval
// extraction for the 500 Hz proprioceptive stream.
//
// C++ counterpart of the reference's node/buffer layer (reference:
// src/main.cpp:255-330 sensor_callback + estimator input buffers
// estimator.h:115-125 and the measurement-interval drain
// estimator.cpp:303-397 getIMUAndLegInterval): a single-producer
// single-consumer ring buffer holding fused IMU+joint samples, with boundary
// interpolation when extracting [t0, t1] intervals (the reference lerps
// boundary gyro/leg samples via Utility::lerpGyro/lerpLegSensors,
// utility.cpp:24-104).
//
// Built as a shared library (make -C native) and bound via ctypes
// (cerberus_tpu/native.py). The Python IntervalBuffer path remains as
// fallback when the library is absent.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kDofs = 12;
constexpr int kLegs = 4;
// one fused sample: t, acc3, gyr3, phi12, dphi12, contact4
constexpr int kSampleDoubles = 1 + 3 + 3 + kDofs + kDofs + kLegs;

struct Ring {
  std::vector<double> data;   // capacity * kSampleDoubles
  size_t capacity;
  std::atomic<uint64_t> head{0};  // next write index (monotonic)
  std::atomic<uint64_t> tail{0};  // oldest retained index (monotonic)

  explicit Ring(size_t cap) : data(cap * kSampleDoubles), capacity(cap) {}

  double* slot(uint64_t idx) { return data.data() + (idx % capacity) * kSampleDoubles; }
  const double* slot(uint64_t idx) const {
    return data.data() + (idx % capacity) * kSampleDoubles;
  }
};

}  // namespace

extern "C" {

void* sync_create(uint64_t capacity) { return new Ring(capacity); }

void sync_destroy(void* h) { delete static_cast<Ring*>(h); }

// Producer: push one fused sample. Overwrites oldest when full.
void sync_push(void* h, double t, const double* acc, const double* gyr,
               const double* phi, const double* dphi, const double* contact) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  double* s = r->slot(head);
  s[0] = t;
  std::memcpy(s + 1, acc, 3 * sizeof(double));
  std::memcpy(s + 4, gyr, 3 * sizeof(double));
  std::memcpy(s + 7, phi, kDofs * sizeof(double));
  std::memcpy(s + 7 + kDofs, dphi, kDofs * sizeof(double));
  std::memcpy(s + 7 + 2 * kDofs, contact, kLegs * sizeof(double));
  r->head.store(head + 1, std::memory_order_release);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  if (head + 1 - tail > r->capacity)
    r->tail.store(head + 1 - r->capacity, std::memory_order_release);
}

uint64_t sync_size(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// Latest sample timestamp, or -1 if empty.
double sync_latest_time(void* h) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head == tail) return -1.0;
  return r->slot(head - 1)[0];
}

// Consumer: extract all samples with t in (t0, t1], with an interpolated
// boundary sample at exactly t1 when the stream extends beyond it, and a
// leading boundary sample at t0 (interpolated) when one exists before t0.
// Samples older than t0 are dropped from the ring (consumed).
//
// out: caller buffer of max_out * kSampleDoubles doubles, packed rows.
// Returns the number of rows written (0 if insufficient data), or -1 if the
// stream has not yet reached t1.
int64_t sync_extract(void* h, double t0, double t1, double* out,
                     int64_t max_out) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head == tail) return -1;
  if (r->slot(head - 1)[0] < t1) return -1;  // not enough data yet

  int64_t n = 0;
  auto emit = [&](const double* s) {
    if (n < max_out) {
      std::memcpy(out + n * kSampleDoubles, s, kSampleDoubles * sizeof(double));
      ++n;
    }
  };
  auto lerp_into = [&](const double* a, const double* b, double t) {
    double w = (t - a[0]) / (b[0] - a[0] + 1e-18);
    double tmp[kSampleDoubles];
    tmp[0] = t;
    for (int i = 1; i < kSampleDoubles; ++i)
      tmp[i] = a[i] + (b[i] - a[i]) * w;
    // contacts: snap to nearest sample, they are flags/forces not smooth
    const double* near = (w < 0.5) ? a : b;
    std::memcpy(tmp + 7 + 2 * kDofs, near + 7 + 2 * kDofs,
                kLegs * sizeof(double));
    emit(tmp);
  };

  uint64_t i = tail;
  // find the first sample with t > t0; keep its predecessor for boundary lerp
  const double* prev = nullptr;
  for (; i < head && r->slot(i)[0] <= t0; ++i) prev = r->slot(i);
  if (prev && i < head) {
    lerp_into(prev, r->slot(i), t0);
  }
  for (; i < head && r->slot(i)[0] <= t1; ++i) {
    emit(r->slot(i));
    prev = r->slot(i);
  }
  if (i < head && prev && prev[0] < t1) {
    lerp_into(prev, r->slot(i), t1);
  }
  // consume: drop everything strictly older than t1's predecessor so the
  // next interval can still boundary-interpolate
  uint64_t new_tail = (i > tail + 1) ? i - 1 : tail;
  r->tail.store(new_tail, std::memory_order_release);
  return n;
}

// ---------------------------------------------------------------------------
// CSV result writer (reference: main.cpp:152-197 writes 20 columns every 50
// frames). Append-only, flushed per row.
#include <cstdio>

void* csv_open(const char* path, const char* header) {
  FILE* f = std::fopen(path, "w");
  if (!f) return nullptr;
  std::fprintf(f, "%s\n", header);
  return f;
}

void csv_row(void* f, const double* vals, int64_t n) {
  FILE* fp = static_cast<FILE*>(f);
  for (int64_t i = 0; i < n; ++i)
    std::fprintf(fp, i + 1 == n ? "%.9g" : "%.9g,", vals[i]);
  std::fputc('\n', fp);
  std::fflush(fp);
}

void csv_close(void* f) { std::fclose(static_cast<FILE*>(f)); }

}  // extern "C"
