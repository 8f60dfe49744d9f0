// Threaded binary prefetch loader (C++, ctypes ABI).
//
// Native data-loading runtime replacing the reference's mmcv dataloader
// worker processes (reference: workers_per_gpu=2 in
// ResDet3D_nuscenes_mini_config.py:173 + mmcv build_dataloader). A fixed
// thread pool reads files (lidar .bin sweeps, images) into caller-owned
// buffers ahead of the training loop; submission/collection is
// non-blocking so host IO overlaps device steps.
//
// Build: g++ -O3 -shared -fPIC -pthread loader.cpp -o libloader.so

#include <atomic>
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

struct Task {
  int64_t id;
  std::string path;
  uint8_t* dst;
  int64_t capacity;
  int64_t read_bytes = -1;  // -1 = pending/error
  bool done = false;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Task*> queue;
  std::vector<Task*> all;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};
  int64_t next_id = 0;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { run(); });
    }
  }

  ~Pool() {
    stop = true;
    cv.notify_all();
    for (auto& w : workers) w.join();
    for (auto* t : all) delete t;
  }

  void run() {
    while (true) {
      Task* t = nullptr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        t = queue.front();
        queue.pop_front();
      }
      FILE* f = std::fopen(t->path.c_str(), "rb");
      int64_t got = -1;
      if (f) {
        got = (int64_t)std::fread(t->dst, 1, (size_t)t->capacity, f);
        std::fclose(f);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        t->read_bytes = got;
        t->done = true;
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(int n_threads) { return new Pool(n_threads); }

void loader_destroy(void* p) { delete (Pool*)p; }

// submit an async read of up to `capacity` bytes of `path` into `dst`
// (caller keeps dst alive). Returns a task id.
int64_t loader_submit(void* p, const char* path, uint8_t* dst,
                      int64_t capacity) {
  Pool* pool = (Pool*)p;
  Task* t = new Task{};
  {
    std::lock_guard<std::mutex> lk(pool->mu);
    t->id = pool->next_id++;
    t->path = path;
    t->dst = dst;
    t->capacity = capacity;
    pool->queue.push_back(t);
    pool->all.push_back(t);
  }
  pool->cv.notify_one();
  return t->id;
}

// blocking wait; returns bytes read (-1 on error).
int64_t loader_wait(void* p, int64_t id) {
  Pool* pool = (Pool*)p;
  std::unique_lock<std::mutex> lk(pool->mu);
  Task* target = nullptr;
  for (auto* t : pool->all)
    if (t->id == id) target = t;
  if (!target) return -2;
  pool->cv.wait(lk, [&] { return target->done; });
  return target->read_bytes;
}

// non-blocking poll; returns 1 if done, 0 otherwise.
int loader_poll(void* p, int64_t id) {
  Pool* pool = (Pool*)p;
  std::lock_guard<std::mutex> lk(pool->mu);
  for (auto* t : pool->all)
    if (t->id == id) return t->done ? 1 : 0;
  return -1;
}

}  // extern "C"
