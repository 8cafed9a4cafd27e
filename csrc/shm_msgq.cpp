// Lock-free single-producer/single-consumer shared-memory message queue.
//
// TPU-native analog of the reference's control-plane transport
// (vllm/distributed/device_communicators/shm_broadcast.py — a Python
// mmap ring used to broadcast scheduler outputs to local workers, plus
// the ZMQ socket pair of vllm/engine/multiprocessing/).  Here the hot
// path is C++: a fixed-slot ring over POSIX shared memory with C11
// acquire/release atomics and adaptive spin-then-sleep waiting, exposed
// through a minimal C ABI consumed via ctypes
// (vllm_paged_compression_tpu/parallel/shm_msgq.py).
//
// Layout:  [Header | slot 0 | slot 1 | ... | slot capacity-1]
// each slot: [uint32 len | payload bytes (max_msg)]
// One queue is one direction; a duplex channel is two queues.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <ctime>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Header {
  std::atomic<uint64_t> head;  // next slot to write (producer-owned)
  std::atomic<uint64_t> tail;  // next slot to read (consumer-owned)
  uint32_t capacity;
  uint32_t max_msg;
  uint32_t magic;
};

constexpr uint32_t kMagic = 0x53514d56;  // "VMQS"

struct Queue {
  Header* hdr;
  uint8_t* slots;
  size_t map_bytes;
  int owner;
  char name[256];
};

inline size_t slot_stride(uint32_t max_msg) {
  return ((sizeof(uint32_t) + max_msg + 63) / 64) * 64;  // cacheline pad
}

inline void backoff(int iter) {
  if (iter < 1024) return;  // pure spin first ~microseconds
  struct timespec ts = {0, iter < 8192 ? 1000L : 50000L};
  nanosleep(&ts, nullptr);
}

inline int64_t now_us() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return int64_t(ts.tv_sec) * 1000000 + ts.tv_nsec / 1000;
}

}  // namespace

extern "C" {

void* shmq_create(const char* name, uint32_t capacity, uint32_t max_msg) {
  size_t bytes = sizeof(Header) + size_t(capacity) * slot_stride(max_msg);
  shm_unlink(name);  // stale queue from a crashed run
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  if (ftruncate(fd, (off_t)bytes) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  void* mem = mmap(nullptr, bytes, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) {
    shm_unlink(name);
    return nullptr;
  }
  auto* q = new Queue();
  q->hdr = static_cast<Header*>(mem);
  q->slots = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  q->map_bytes = bytes;
  q->owner = 1;
  strncpy(q->name, name, sizeof(q->name) - 1);
  q->hdr->head.store(0, std::memory_order_relaxed);
  q->hdr->tail.store(0, std::memory_order_relaxed);
  q->hdr->capacity = capacity;
  q->hdr->max_msg = max_msg;
  std::atomic_thread_fence(std::memory_order_release);
  q->hdr->magic = kMagic;
  return q;
}

void* shmq_open(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  void* mem =
      mmap(nullptr, st.st_size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;
  auto* hdr = static_cast<Header*>(mem);
  if (hdr->magic != kMagic) {
    munmap(mem, st.st_size);
    return nullptr;
  }
  auto* q = new Queue();
  q->hdr = hdr;
  q->slots = reinterpret_cast<uint8_t*>(mem) + sizeof(Header);
  q->map_bytes = st.st_size;
  q->owner = 0;
  strncpy(q->name, name, sizeof(q->name) - 1);
  return q;
}

// Returns 0 on success, -1 on timeout, -2 on oversize message.
int shmq_send(void* qp, const void* data, uint32_t len, int64_t timeout_us) {
  auto* q = static_cast<Queue*>(qp);
  Header* h = q->hdr;
  if (len > h->max_msg) return -2;
  const size_t stride = slot_stride(h->max_msg);
  uint64_t head = h->head.load(std::memory_order_relaxed);
  int64_t deadline = timeout_us < 0 ? -1 : now_us() + timeout_us;
  int iter = 0;
  while (head - h->tail.load(std::memory_order_acquire) >= h->capacity) {
    if (deadline >= 0 && now_us() > deadline) return -1;
    backoff(iter++);
  }
  uint8_t* slot = q->slots + (head % h->capacity) * stride;
  memcpy(slot + sizeof(uint32_t), data, len);
  memcpy(slot, &len, sizeof(uint32_t));
  h->head.store(head + 1, std::memory_order_release);
  return 0;
}

// Returns payload length on success, -1 on timeout, -2 if buf too small.
int shmq_recv(void* qp, void* buf, uint32_t buflen, int64_t timeout_us) {
  auto* q = static_cast<Queue*>(qp);
  Header* h = q->hdr;
  uint64_t tail = h->tail.load(std::memory_order_relaxed);
  int64_t deadline = timeout_us < 0 ? -1 : now_us() + timeout_us;
  int iter = 0;
  while (h->head.load(std::memory_order_acquire) <= tail) {
    if (deadline >= 0 && now_us() > deadline) return -1;
    backoff(iter++);
  }
  const size_t stride = slot_stride(h->max_msg);
  uint8_t* slot = q->slots + (tail % h->capacity) * stride;
  uint32_t len;
  memcpy(&len, slot, sizeof(uint32_t));
  if (len > buflen) return -2;
  memcpy(buf, slot + sizeof(uint32_t), len);
  h->tail.store(tail + 1, std::memory_order_release);
  return (int)len;
}

int shmq_pending(void* qp) {
  auto* q = static_cast<Queue*>(qp);
  return (int)(q->hdr->head.load(std::memory_order_acquire) -
               q->hdr->tail.load(std::memory_order_acquire));
}

uint32_t shmq_max_msg(void* qp) {
  return static_cast<Queue*>(qp)->hdr->max_msg;
}

void shmq_close(void* qp) {
  auto* q = static_cast<Queue*>(qp);
  int unlink_it = q->owner;
  char name[256];
  strncpy(name, q->name, sizeof(name));
  munmap(q->hdr, q->map_bytes);
  if (unlink_it) shm_unlink(name);
  delete q;
}

void shmq_unlink(const char* name) { shm_unlink(name); }

}  // extern "C"
