// Native point-cloud batch loader.
//
// The reference loads every submap with per-file Python NumPy reads inside
// the training hot loop (reference: loading_pointclouds.py load_pc_file(s)
// — SURVEY C3, hot-loop call stack §3.1). Descriptor-cache refreshes read
// the whole ~22k-file training corpus. This loader does the same work as a
// C thread pool: raw float64 .bin -> float32 (N, C) batch tensors, many
// files in flight at once, zero Python in the per-file path.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   lpd_loader_create(n_threads)            -> opaque handle
//   lpd_load_batch(handle, paths, count, num_points, dims, out, statuses)
//       paths: array of char* (count entries)
//       out:   float32 buffer of count*num_points*dims
//       statuses: per-file int (0 ok, <0 error code)
//       returns number of successfully loaded files
//   lpd_loader_destroy(handle)
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrSize = -2;
constexpr int kErrRead = -3;

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void Submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// Read one raw-float64 file into a float32 row of the batch tensor.
int LoadOne(const char* path, int64_t num_points, int64_t dims, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t expect = num_points * dims * static_cast<int64_t>(sizeof(double));
  if (size != expect) {
    std::fclose(f);
    return kErrSize;
  }
  std::vector<double> buf(num_points * dims);
  const size_t got = std::fread(buf.data(), sizeof(double), buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return kErrRead;
  for (size_t i = 0; i < buf.size(); ++i) {
    out[i] = static_cast<float>(buf[i]);
  }
  return kOk;
}

struct Loader {
  explicit Loader(int n_threads) : pool(n_threads) {}
  ThreadPool pool;
};

}  // namespace

extern "C" {

void* lpd_loader_create(int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  return new Loader(n_threads);
}

int lpd_load_batch(void* handle, const char** paths, int count,
                   int num_points, int dims, float* out, int* statuses) {
  Loader* loader = static_cast<Loader*>(handle);
  std::atomic<int> ok_count{0};
  std::atomic<int> remaining{count};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const int64_t stride = static_cast<int64_t>(num_points) * dims;
  for (int i = 0; i < count; ++i) {
    loader->pool.Submit([&, i] {
      const int st = LoadOne(paths[i], num_points, dims, out + i * stride);
      statuses[i] = st;
      if (st == kOk) ok_count.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return remaining.load() == 0; });
  return ok_count.load();
}

void lpd_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

}  // extern "C"
