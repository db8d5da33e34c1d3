// slamio — native IO runtime for slam_rgbd_tpu.
//
// TPU-native equivalents of the reference's C runtime modules
// (SURVEY.md §2): the .bin recording codec (`LoggingModule/loggingModule.c:
// 101-130,404-444`), the bounded frame transport with drop policy
// (`frameDefinitions.h:59-64` mqueues + `SLAM.cpp:162-168` drop-to), and
// the producer thread feeding consumers (`sensorModule.c:69-264`). The
// compute path is JAX/XLA; this library keeps the host IO path native:
// buffered frame codec, a mutex+condvar bounded ring with drop-oldest
// backpressure, and a prefetching reader thread that decodes ahead of the
// tracker so device steps never wait on disk.
//
// C ABI only (consumed via ctypes). File format is identical to the
// Python implementation in slam_rgbd_tpu/io/stream.py (magic "RGBDTPU2",
// little-endian header: u64 frame_id, u64 ts_us, u32 type, u32 w, u32 h,
// u32 depth_bytes, u32 color_bytes, u32 crc32 of depth+color payload),
// validated bit-identical in tests. Legacy "RGBDTPU1" recordings (no CRC
// field) stay readable.

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

constexpr char kMagic[8] = {'R', 'G', 'B', 'D', 'T', 'P', 'U', '2'};
constexpr char kMagicV1[8] = {'R', 'G', 'B', 'D', 'T', 'P', 'U', '1'};
constexpr uint32_t kFrameSensor = 1;
constexpr uint32_t kFrameEof = 2;

#pragma pack(push, 1)
struct FrameHeader {
  uint64_t frame_id;
  uint64_t ts_us;
  uint32_t type;
  uint32_t width;
  uint32_t height;
  uint32_t depth_bytes;
  uint32_t color_bytes;
  uint32_t crc32;  // zlib CRC32 over depth||color payload (v2 only)
};
#pragma pack(pop)
static_assert(sizeof(FrameHeader) == 40, "header layout must match stream.py");
constexpr size_t kHdrV1Bytes = 36;  // v1 header: no crc32 field

// zlib-compatible CRC32 (IEEE polynomial, reflected).
uint32_t crc32_update(uint32_t crc, const uint8_t* data, size_t n) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc ^= 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

struct Writer {
  FILE* f = nullptr;
  uint64_t next_id = 0;
  std::mutex mu;
};

struct Reader {
  FILE* f = nullptr;
  bool done = false;
  bool v1 = false;  // legacy format: 36-byte header, no CRC check
};

// Reads one header, handling the v1/v2 layout difference.
bool read_header(FILE* f, bool v1, FrameHeader* h) {
  h->crc32 = 0;
  size_t n = v1 ? kHdrV1Bytes : sizeof(FrameHeader);
  return fread(h, 1, n, f) == n;
}

// One frame's payload in the ring.
struct Slot {
  FrameHeader hdr;
  std::vector<uint8_t> depth;
  std::vector<uint8_t> color;
};

// Bounded MPSC ring with the reference's drop-oldest policy: when depth
// exceeds `capacity`, old frames are discarded down to `drop_to`
// (SLAM.cpp:162-168 semantics — keep the freshest, bound latency).
struct Queue {
  size_t capacity;
  size_t drop_to;
  std::deque<Slot> q;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<uint64_t> dropped{0};
  bool closed = false;

  void push(Slot&& s) {
    {
      std::lock_guard<std::mutex> lock(mu);
      q.push_back(std::move(s));
      if (q.size() > capacity) {
        size_t n = q.size() - drop_to;
        for (size_t i = 0; i < n; ++i) q.pop_front();
        dropped += n;
      }
    }
    cv.notify_one();
  }

  // 1 = frame, 0 = closed+drained, -2 = timeout
  int pop(Slot* out, int timeout_ms) {
    std::unique_lock<std::mutex> lock(mu);
    auto pred = [&] { return !q.empty() || closed; };
    if (timeout_ms < 0) {
      cv.wait(lock, pred);
    } else if (!cv.wait_for(lock, std::chrono::milliseconds(timeout_ms), pred)) {
      return -2;
    }
    if (q.empty()) return 0;
    *out = std::move(q.front());
    q.pop_front();
    return 1;
  }

  void close() {
    {
      std::lock_guard<std::mutex> lock(mu);
      closed = true;
    }
    cv.notify_all();
  }
};

// Prefetcher: a reader thread decoding ahead into a Queue.
struct Prefetcher {
  Reader* reader = nullptr;
  Queue* queue = nullptr;
  std::thread thread;
  std::atomic<bool> stop{false};
  std::atomic<int> error{0};
};

bool read_exact(FILE* f, void* buf, size_t n) {
  return fread(buf, 1, n, f) == n;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------------ writer
void* slamio_writer_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  if (fwrite(kMagic, 1, 8, f) != 8) {
    fclose(f);
    return nullptr;
  }
  auto* w = new Writer();
  w->f = f;
  return w;
}

// Returns the frame id written, or -1 on error.
int64_t slamio_writer_write(void* handle, uint64_t ts_us, uint32_t width,
                            uint32_t height, const uint8_t* depth,
                            const uint8_t* color) {
  auto* w = static_cast<Writer*>(handle);
  std::lock_guard<std::mutex> lock(w->mu);
  FrameHeader h;
  h.frame_id = w->next_id;
  h.ts_us = ts_us;
  h.type = kFrameSensor;
  h.width = width;
  h.height = height;
  h.depth_bytes = width * height * 2;
  h.color_bytes = width * height * 3;
  h.crc32 = crc32_update(crc32_update(0, depth, h.depth_bytes), color,
                         h.color_bytes);
  if (fwrite(&h, sizeof(h), 1, w->f) != 1) return -1;
  if (fwrite(depth, 1, h.depth_bytes, w->f) != h.depth_bytes) return -1;
  if (fwrite(color, 1, h.color_bytes, w->f) != h.color_bytes) return -1;
  fflush(w->f);  // crash-consistent, like saveFrameToFile's fflush
  return static_cast<int64_t>(w->next_id++);
}

int slamio_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  {
    std::lock_guard<std::mutex> lock(w->mu);
    FrameHeader h{};
    h.frame_id = w->next_id;
    h.type = kFrameEof;
    fwrite(&h, sizeof(h), 1, w->f);
    fflush(w->f);
    fclose(w->f);
  }
  delete w;
  return 0;
}

// ------------------------------------------------------------------ reader
void* slamio_reader_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  if (!read_exact(f, magic, 8)) {
    fclose(f);
    return nullptr;
  }
  bool v2 = memcmp(magic, kMagic, 8) == 0;
  bool v1 = memcmp(magic, kMagicV1, 8) == 0;
  if (!v2 && !v1) {
    fclose(f);
    return nullptr;
  }
  auto* r = new Reader();
  r->f = f;
  r->v1 = v1;
  return r;
}

// Reads the next frame into caller buffers (sized >= depth/color bytes).
// Returns 1 = frame, 0 = clean EOF, -1 = corrupt/truncated.
// hdr_out: u64 frame_id, u64 ts_us, u32 width, u32 height (24 bytes).
int slamio_reader_next(void* handle, uint8_t* hdr_out, uint8_t* depth_buf,
                       uint64_t depth_cap, uint8_t* rgb_buf, uint64_t rgb_cap) {
  auto* r = static_cast<Reader*>(handle);
  if (r->done) return 0;
  FrameHeader h;
  if (!read_header(r->f, r->v1, &h)) {
    r->done = true;  // truncated recording: stop cleanly like stream.py
    return 0;
  }
  if (h.type == kFrameEof) {
    r->done = true;
    return 0;
  }
  if (h.type != kFrameSensor || h.depth_bytes != h.width * h.height * 2 ||
      h.color_bytes != h.width * h.height * 3 || h.depth_bytes > depth_cap ||
      h.color_bytes > rgb_cap) {
    return -1;
  }
  if (!read_exact(r->f, depth_buf, h.depth_bytes)) return -1;
  if (!read_exact(r->f, rgb_buf, h.color_bytes)) return -1;
  if (!r->v1) {
    uint32_t crc = crc32_update(crc32_update(0, depth_buf, h.depth_bytes),
                                rgb_buf, h.color_bytes);
    if (crc != h.crc32) return -1;  // payload corrupted on disk
  }
  memcpy(hdr_out, &h.frame_id, 8);
  memcpy(hdr_out + 8, &h.ts_us, 8);
  memcpy(hdr_out + 16, &h.width, 4);
  memcpy(hdr_out + 20, &h.height, 4);
  return 1;
}

int slamio_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  fclose(r->f);
  delete r;
  return 0;
}

// ------------------------------------------------------------------- queue
void* slamio_queue_create(uint32_t capacity, uint32_t drop_to) {
  auto* q = new Queue();
  q->capacity = capacity;
  q->drop_to = drop_to;
  return q;
}

int slamio_queue_push(void* handle, uint64_t frame_id, uint64_t ts_us,
                      uint32_t width, uint32_t height, const uint8_t* depth,
                      const uint8_t* color) {
  auto* q = static_cast<Queue*>(handle);
  Slot s;
  s.hdr.frame_id = frame_id;
  s.hdr.ts_us = ts_us;
  s.hdr.type = kFrameSensor;
  s.hdr.width = width;
  s.hdr.height = height;
  s.hdr.depth_bytes = width * height * 2;
  s.hdr.color_bytes = width * height * 3;
  s.depth.assign(depth, depth + s.hdr.depth_bytes);
  s.color.assign(color, color + s.hdr.color_bytes);
  q->push(std::move(s));
  return 0;
}

int slamio_queue_pop(void* handle, uint8_t* hdr_out, uint8_t* depth_buf,
                     uint64_t depth_cap, uint8_t* rgb_buf, uint64_t rgb_cap,
                     int timeout_ms) {
  auto* q = static_cast<Queue*>(handle);
  Slot s;
  int rc = q->pop(&s, timeout_ms);
  if (rc != 1) return rc;
  if (s.hdr.depth_bytes > depth_cap || s.hdr.color_bytes > rgb_cap) return -1;
  memcpy(hdr_out, &s.hdr.frame_id, 8);
  memcpy(hdr_out + 8, &s.hdr.ts_us, 8);
  memcpy(hdr_out + 16, &s.hdr.width, 4);
  memcpy(hdr_out + 20, &s.hdr.height, 4);
  memcpy(depth_buf, s.depth.data(), s.hdr.depth_bytes);
  memcpy(rgb_buf, s.color.data(), s.hdr.color_bytes);
  return 1;
}

uint64_t slamio_queue_dropped(void* handle) {
  return static_cast<Queue*>(handle)->dropped.load();
}

uint64_t slamio_queue_depth(void* handle) {
  auto* q = static_cast<Queue*>(handle);
  std::lock_guard<std::mutex> lock(q->mu);
  return q->q.size();
}

void slamio_queue_close(void* handle) { static_cast<Queue*>(handle)->close(); }

void slamio_queue_destroy(void* handle) { delete static_cast<Queue*>(handle); }

// -------------------------------------------------------------- prefetcher
// Reader thread decoding `path` ahead into an internal queue.
void* slamio_prefetch_open(const char* path, uint32_t capacity,
                           uint32_t drop_to) {
  void* rh = slamio_reader_open(path);
  if (!rh) return nullptr;
  auto* p = new Prefetcher();
  p->reader = static_cast<Reader*>(rh);
  p->queue = new Queue();
  p->queue->capacity = capacity;
  p->queue->drop_to = drop_to == 0 ? capacity : drop_to;
  p->thread = std::thread([p] {
    FILE* f = p->reader->f;
    while (!p->stop.load()) {
      Slot s;
      if (!read_header(f, p->reader->v1, &s.hdr) || s.hdr.type == kFrameEof) break;
      if (s.hdr.type != kFrameSensor ||
          s.hdr.depth_bytes != s.hdr.width * s.hdr.height * 2 ||
          s.hdr.color_bytes != s.hdr.width * s.hdr.height * 3) {
        p->error.store(-1);
        break;
      }
      s.depth.resize(s.hdr.depth_bytes);
      s.color.resize(s.hdr.color_bytes);
      if (!read_exact(f, s.depth.data(), s.hdr.depth_bytes) ||
          !read_exact(f, s.color.data(), s.hdr.color_bytes)) {
        p->error.store(-1);
        break;
      }
      if (!p->reader->v1 &&
          crc32_update(crc32_update(0, s.depth.data(), s.hdr.depth_bytes),
                       s.color.data(), s.hdr.color_bytes) != s.hdr.crc32) {
        p->error.store(-1);
        break;
      }
      // block (bounded) instead of dropping for file replay: wait for space
      for (;;) {
        {
          std::lock_guard<std::mutex> lock(p->queue->mu);
          if (p->queue->q.size() < p->queue->capacity) break;
        }
        if (p->stop.load()) return;
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
      }
      p->queue->push(std::move(s));
    }
    p->queue->close();
  });
  return p;
}

int slamio_prefetch_next(void* handle, uint8_t* hdr_out, uint8_t* depth_buf,
                         uint64_t depth_cap, uint8_t* rgb_buf,
                         uint64_t rgb_cap, int timeout_ms) {
  auto* p = static_cast<Prefetcher*>(handle);
  int rc = slamio_queue_pop(p->queue, hdr_out, depth_buf, depth_cap, rgb_buf,
                            rgb_cap, timeout_ms);
  if (rc == 0 && p->error.load() != 0) return -1;
  return rc;
}

void slamio_prefetch_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  p->stop.store(true);
  p->queue->close();
  if (p->thread.joinable()) p->thread.join();
  fclose(p->reader->f);
  delete p->reader;
  delete p->queue;
  delete p;
}

const char* slamio_version() { return "slamio 0.1.0"; }

}  // extern "C"
