// lmsf_io — native data-plane runtime for lmsf_slam_tpu.
//
// The reference's runtime is C++ end to end: per-keyframe PCD files as the
// lifelong store (pose_graph_database.hpp:307-315), ROS message transport,
// and thread+queue pipelines (DataManager, data_manager.hpp:106-197). The
// TPU rebuild keeps compute in XLA but gives the host data plane the same
// native treatment: a zero-copy scan reader (KITTI .bin / raw float32),
// binary PCD read/write for interop with the reference's stores, a lock-free
// SPSC ring buffer (the DataManager bus equivalent), and a background
// prefetch loader that keeps the device fed without Python in the file loop.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Raw float32 file IO (KITTI velodyne .bin = packed float32 x,y,z,intensity)
// ---------------------------------------------------------------------------

// Returns number of floats read, or -1 on error.
int64_t lmsf_read_f32(const char* path, float* out, int64_t max_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t n = (int64_t)std::fread(out, sizeof(float), (size_t)max_floats, f);
  std::fclose(f);
  return n;
}

int64_t lmsf_file_size(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t n = std::ftell(f);
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Binary PCD v0.7 (x y z float32) — interop with the reference's keyframe
// cloud files.
// ---------------------------------------------------------------------------

int lmsf_write_pcd(const char* path, const float* xyz, int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "# .PCD v0.7 - Point Cloud Data file format\n"
               "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
               "COUNT 1 1 1\nWIDTH %lld\nHEIGHT 1\n"
               "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS %lld\nDATA binary\n",
               (long long)n, (long long)n);
  size_t w = std::fwrite(xyz, sizeof(float) * 3, (size_t)n, f);
  std::fclose(f);
  return w == (size_t)n ? 0 : -1;
}

// Returns number of points read into out_xyz (3 floats each), or -1.
int64_t lmsf_read_pcd(const char* path, float* out_xyz, int64_t max_pts) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t points = -1;
  bool binary = false;
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "POINTS", 6) == 0) {
      points = std::atoll(line + 6);
    } else if (std::strncmp(line, "DATA", 4) == 0) {
      binary = std::strstr(line, "binary") != nullptr;
      break;
    }
  }
  if (points < 0 || !binary) {
    std::fclose(f);
    return -1;
  }
  if (points > max_pts) points = max_pts;
  int64_t n = (int64_t)std::fread(out_xyz, sizeof(float) * 3, (size_t)points, f);
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC ring buffer of fixed-size slots — the native counterpart of
// the reference's DataManager capacity-bounded deques.
// ---------------------------------------------------------------------------

struct LmsfRing {
  int64_t slot_bytes;
  int64_t n_slots;
  std::vector<uint8_t> data;
  std::vector<int64_t> sizes;  // payload bytes per slot
  std::atomic<int64_t> head{0};  // next write
  std::atomic<int64_t> tail{0};  // next read
};

void* lmsf_ring_create(int64_t slot_bytes, int64_t n_slots) {
  auto* r = new LmsfRing();
  r->slot_bytes = slot_bytes;
  r->n_slots = n_slots;
  r->data.resize((size_t)(slot_bytes * n_slots));
  r->sizes.resize((size_t)n_slots);
  return r;
}

void lmsf_ring_destroy(void* h) { delete (LmsfRing*)h; }

// 0 on success, -1 when full (non-blocking; caller decides policy).
int lmsf_ring_push(void* h, const void* payload, int64_t bytes) {
  auto* r = (LmsfRing*)h;
  if (bytes > r->slot_bytes) return -2;
  int64_t head = r->head.load(std::memory_order_relaxed);
  int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->n_slots) return -1;  // full
  int64_t slot = head % r->n_slots;
  std::memcpy(r->data.data() + slot * r->slot_bytes, payload, (size_t)bytes);
  r->sizes[(size_t)slot] = bytes;
  r->head.store(head + 1, std::memory_order_release);
  return 0;
}

// Returns payload bytes, or -1 when empty.
int64_t lmsf_ring_pop(void* h, void* out) {
  auto* r = (LmsfRing*)h;
  int64_t tail = r->tail.load(std::memory_order_relaxed);
  int64_t head = r->head.load(std::memory_order_acquire);
  if (tail >= head) return -1;  // empty
  int64_t slot = tail % r->n_slots;
  int64_t bytes = r->sizes[(size_t)slot];
  std::memcpy(out, r->data.data() + slot * r->slot_bytes, (size_t)bytes);
  r->tail.store(tail + 1, std::memory_order_release);
  return bytes;
}

int64_t lmsf_ring_size(void* h) {
  auto* r = (LmsfRing*)h;
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// ---------------------------------------------------------------------------
// Background prefetch loader: a reader thread streams files through the ring
// so Python/JAX never blocks on disk (the reference's per-keyframe disk reads
// happen inline on its localization thread; this is the overlap it lacked).
// ---------------------------------------------------------------------------

struct LmsfPrefetcher {
  std::vector<std::string> paths;
  LmsfRing* ring;
  std::thread worker;
  std::atomic<bool> stop{false};
  std::atomic<bool> finished{false};
  std::mutex m;
  std::condition_variable cv;

  void run() {
    std::vector<float> buf((size_t)(ring->slot_bytes / sizeof(float)));
    for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
      int64_t n = lmsf_read_f32(paths[i].c_str(), buf.data(),
                                ring->slot_bytes / (int64_t)sizeof(float));
      if (n < 0) n = 0;
      while (!stop.load() &&
             lmsf_ring_push(ring, buf.data(), n * (int64_t)sizeof(float)) == -1) {
        std::unique_lock<std::mutex> lk(m);
        cv.wait_for(lk, std::chrono::milliseconds(1));
      }
    }
    finished.store(true);
  }
};

void* lmsf_prefetch_create(const char** paths, int n_paths, int64_t slot_bytes,
                           int64_t n_slots) {
  auto* p = new LmsfPrefetcher();
  for (int i = 0; i < n_paths; ++i) p->paths.emplace_back(paths[i]);
  p->ring = (LmsfRing*)lmsf_ring_create(slot_bytes, n_slots);
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocking pop of the next file's floats; returns float count or -1 when the
// stream is exhausted. ``max_floats`` must be ≥ the slot capacity.
int64_t lmsf_prefetch_next(void* h, float* out, int64_t max_floats) {
  auto* p = (LmsfPrefetcher*)h;
  if (max_floats * (int64_t)sizeof(float) < p->ring->slot_bytes) return -2;
  for (;;) {
    int64_t bytes = lmsf_ring_pop(p->ring, out);
    if (bytes >= 0) {
      p->cv.notify_one();
      return bytes / (int64_t)sizeof(float);
    }
    if (p->stop.load()) return -1;
    if (p->finished.load() && lmsf_ring_size(p->ring) == 0) return -1;
    std::this_thread::sleep_for(std::chrono::microseconds(200));
  }
}

void lmsf_prefetch_destroy(void* h) {
  auto* p = (LmsfPrefetcher*)h;
  p->stop.store(true);
  p->cv.notify_all();
  if (p->worker.joinable()) p->worker.join();
  lmsf_ring_destroy(p->ring);
  delete p;
}

}  // extern "C"
