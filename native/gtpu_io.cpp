// gtpu_io — native frame loader for the TPU media framework.
//
// TPU-native equivalent of the reference's C data-path runtime around
// file ingest (subprojects/gstreamer/plugins/elements/gstfilesrc.c and
// the GstTask streaming-thread model, gst/gsttask.c:348): an mmap-backed
// reader with a background prefetch thread filling a ring of batch
// slots, so host IO overlaps device compute.  Exposed to Python via
// ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -shared -fPIC -o gtpu_io.so gtpu_io.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

struct Y4MInfo {
  int32_t width;
  int32_t height;
  int32_t fps_n;
  int32_t fps_d;
  int32_t frame_size;   // bytes per frame payload
  int64_t n_frames;
  char chroma[16];
};

struct Reader {
  int fd = -1;
  uint8_t *map = nullptr;
  size_t map_len = 0;
  size_t header_len = 0;     // y4m stream header
  size_t frame_prefix = 0;   // per-frame "FRAME\n" prefix length (y4m)
  size_t frame_size = 0;
  int64_t n_frames = 0;
  int64_t pos = 0;           // next frame index

  // prefetch ring
  std::thread worker;
  std::vector<std::vector<uint8_t>> slots;
  std::vector<int64_t> slot_first;   // first frame index in the slot
  std::vector<int32_t> slot_count;
  int batch = 0;
  int n_slots = 0;
  std::atomic<int64_t> head{0};      // produced slots
  std::atomic<int64_t> tail{0};      // consumed slots
  std::atomic<bool> stop{false};
  std::mutex mtx;
  std::condition_variable cv_prod, cv_cons;
};

static int64_t count_frames(Reader *r) {
  if (r->frame_size == 0) return 0;
  size_t per = r->frame_size + r->frame_prefix;
  return (int64_t)((r->map_len - r->header_len) / per);
}

// --- open / close ---------------------------------------------------------

void *gtpu_open_y4m(const char *path, Y4MInfo *info) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  uint8_t *map = (uint8_t *)mmap(nullptr, st.st_size, PROT_READ,
                                 MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { close(fd); return nullptr; }
  madvise(map, st.st_size, MADV_SEQUENTIAL);

  // parse "YUV4MPEG2 W.. H.. F..:.. ... \n"
  const char *head = (const char *)map;
  if (st.st_size < 10 || strncmp(head, "YUV4MPEG2 ", 10) != 0) {
    munmap(map, st.st_size); close(fd); return nullptr;
  }
  const char *nl = (const char *)memchr(head, '\n', st.st_size);
  if (!nl) { munmap(map, st.st_size); close(fd); return nullptr; }
  size_t header_len = nl - head + 1;

  int w = 0, h = 0, fn = 30, fd_ = 1;
  char chroma[16] = "420jpeg";
  std::string hdr(head + 10, nl - head - 10);
  size_t p = 0;
  while (p < hdr.size()) {
    size_t q = hdr.find(' ', p);
    std::string tok = hdr.substr(p, q == std::string::npos ? q : q - p);
    if (!tok.empty()) {
      switch (tok[0]) {
        case 'W': w = atoi(tok.c_str() + 1); break;
        case 'H': h = atoi(tok.c_str() + 1); break;
        case 'F': sscanf(tok.c_str() + 1, "%d:%d", &fn, &fd_); break;
        case 'C': snprintf(chroma, sizeof(chroma), "%s", tok.c_str() + 1);
                  break;
      }
    }
    if (q == std::string::npos) break;
    p = q + 1;
  }
  size_t ysz = (size_t)w * h;
  size_t frame_size;
  if (!strncmp(chroma, "444", 3)) frame_size = ysz * 3;
  else if (!strncmp(chroma, "422", 3)) frame_size = ysz * 2;
  else if (!strncmp(chroma, "mono", 4)) frame_size = ysz;
  else frame_size = ysz * 3 / 2;   // 420 variants

  Reader *r = new Reader();
  r->fd = fd;
  r->map = map;
  r->map_len = st.st_size;
  r->header_len = header_len;
  r->frame_prefix = 6;   // "FRAME\n" (parameters after FRAME unsupported)
  r->frame_size = frame_size;
  r->n_frames = count_frames(r);

  info->width = w;
  info->height = h;
  info->fps_n = fn;
  info->fps_d = fd_;
  info->frame_size = (int32_t)frame_size;
  info->n_frames = r->n_frames;
  snprintf(info->chroma, sizeof(info->chroma), "%s", chroma);
  return r;
}

void *gtpu_open_raw(const char *path, int64_t frame_size) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  uint8_t *map = (uint8_t *)mmap(nullptr, st.st_size, PROT_READ,
                                 MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { close(fd); return nullptr; }
  madvise(map, st.st_size, MADV_SEQUENTIAL);
  Reader *r = new Reader();
  r->fd = fd;
  r->map = map;
  r->map_len = st.st_size;
  r->frame_size = frame_size;
  r->n_frames = count_frames(r);
  return r;
}

int64_t gtpu_n_frames(void *h) { return ((Reader *)h)->n_frames; }

void gtpu_seek(void *h, int64_t frame) {
  Reader *r = (Reader *)h;
  r->pos = frame < 0 ? 0 : (frame > r->n_frames ? r->n_frames : frame);
}

// synchronous batch read: returns frames copied
int32_t gtpu_read_batch(void *h, int32_t n, uint8_t *dst) {
  Reader *r = (Reader *)h;
  size_t per = r->frame_size + r->frame_prefix;
  int32_t got = 0;
  for (; got < n && r->pos < r->n_frames; got++, r->pos++) {
    const uint8_t *src = r->map + r->header_len + (size_t)r->pos * per
                         + r->frame_prefix;
    memcpy(dst + (size_t)got * r->frame_size, src, r->frame_size);
  }
  return got;
}

// --- prefetch ring --------------------------------------------------------

static void prefetch_loop(Reader *r) {
  int64_t next_frame = r->pos;
  while (!r->stop.load()) {
    std::unique_lock<std::mutex> lk(r->mtx);
    r->cv_prod.wait(lk, [r] {
      return r->stop.load() ||
             r->head.load() - r->tail.load() < r->n_slots;
    });
    if (r->stop.load()) break;
    int64_t slot = r->head.load() % r->n_slots;
    lk.unlock();

    size_t per = r->frame_size + r->frame_prefix;
    int32_t got = 0;
    uint8_t *dst = r->slots[slot].data();
    for (; got < r->batch && next_frame < r->n_frames; got++, next_frame++) {
      const uint8_t *src = r->map + r->header_len
                           + (size_t)next_frame * per + r->frame_prefix;
      memcpy(dst + (size_t)got * r->frame_size, src, r->frame_size);
    }
    r->slot_first[slot] = next_frame - got;
    r->slot_count[slot] = got;

    lk.lock();
    r->head.fetch_add(1);
    r->cv_cons.notify_one();
    if (got == 0) break;   // EOS slot published
  }
}

void gtpu_start_prefetch(void *h, int32_t batch, int32_t n_slots) {
  Reader *r = (Reader *)h;
  r->batch = batch;
  r->n_slots = n_slots;
  r->slots.resize(n_slots);
  r->slot_first.assign(n_slots, 0);
  r->slot_count.assign(n_slots, 0);
  for (auto &s : r->slots) s.resize((size_t)batch * r->frame_size);
  r->stop = false;
  r->head = 0;
  r->tail = 0;
  r->worker = std::thread(prefetch_loop, r);
}

// blocks until a prefetched batch is ready; returns frame count (0 = EOS)
int32_t gtpu_get_batch(void *h, uint8_t *dst, int64_t *first_frame) {
  Reader *r = (Reader *)h;
  std::unique_lock<std::mutex> lk(r->mtx);
  r->cv_cons.wait(lk, [r] { return r->head.load() > r->tail.load(); });
  int64_t slot = r->tail.load() % r->n_slots;
  lk.unlock();

  int32_t got = r->slot_count[slot];
  if (got > 0)
    memcpy(dst, r->slots[slot].data(), (size_t)got * r->frame_size);
  if (first_frame) *first_frame = r->slot_first[slot];

  lk.lock();
  r->tail.fetch_add(1);
  r->cv_prod.notify_one();
  return got;
}

void gtpu_close(void *h) {
  Reader *r = (Reader *)h;
  if (r->worker.joinable()) {
    r->stop = true;
    r->cv_prod.notify_all();
    r->cv_cons.notify_all();
    r->worker.join();
  }
  if (r->map) munmap(r->map, r->map_len);
  if (r->fd >= 0) close(r->fd);
  delete r;
}

}  // extern "C"
