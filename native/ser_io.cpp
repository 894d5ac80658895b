// Native SER container I/O for the TPU pipeline.
//
// reference equivalent: video_reader.py:12-109 (header parse + buffered
// frame reads).  The Python fast path already memory-maps the file; this
// native layer adds what Python cannot express efficiently:
//   - posix madvise-driven sequential readahead on the scan payload,
//   - an explicit prefetch window that overlaps disk I/O with the
//     host->device transfer of the previous slab,
//   - a single-copy slab read into a caller-provided (pinnable) buffer.
//
// Exposed as a minimal C ABI consumed via ctypes (io/native.py); the
// framework silently falls back to the pure-Python mmap reader when the
// shared library is unavailable.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kHeaderSize = 178;

struct SerFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  int64_t file_size = 0;
  uint32_t width = 0;
  uint32_t height = 0;
  uint32_t pixel_depth = 0;
  uint32_t frame_count = 0;   // clamped to payload
  int64_t frame_bytes = 0;
};

uint32_t read_u32le(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

}  // namespace

extern "C" {

// Error codes: 0 ok, -1 open/stat, -2 short header, -3 bad header, -4 mmap.
int ser_open(const char* path, void** handle_out, uint32_t* width,
             uint32_t* height, uint32_t* pixel_depth, uint32_t* frame_count) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  if (st.st_size < kHeaderSize) {
    close(fd);
    return -2;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return -4;
  }
  const uint8_t* bytes = static_cast<const uint8_t*>(map);
  SerFile* f = new SerFile;
  f->fd = fd;
  f->map = bytes;
  f->file_size = st.st_size;
  f->width = read_u32le(bytes + 26);
  f->height = read_u32le(bytes + 30);
  f->pixel_depth = read_u32le(bytes + 34);
  f->frame_count = read_u32le(bytes + 38);
  if (f->width == 0 || f->height == 0 ||
      (f->pixel_depth != 8 && f->pixel_depth != 16)) {
    munmap(map, st.st_size);
    close(fd);
    delete f;
    return -3;
  }
  f->frame_bytes =
      static_cast<int64_t>(f->width) * f->height * (f->pixel_depth / 8);
  int64_t payload = f->file_size - kHeaderSize;
  int64_t n = payload / f->frame_bytes;
  if (n < static_cast<int64_t>(f->frame_count)) f->frame_count = static_cast<uint32_t>(n);
  // the scan is consumed front to back; let the kernel stream it
  madvise(const_cast<uint8_t*>(bytes), st.st_size, MADV_SEQUENTIAL);
  *handle_out = f;
  *width = f->width;
  *height = f->height;
  *pixel_depth = f->pixel_depth;
  *frame_count = f->frame_count;
  return 0;
}

// Hint the kernel to start paging in [start, start+count) frames.
int ser_prefetch(void* handle, uint32_t start, uint32_t count) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || start >= f->frame_count) return -1;
  if (start + count > f->frame_count) count = f->frame_count - start;
  const uint8_t* p = f->map + kHeaderSize + static_cast<int64_t>(start) * f->frame_bytes;
  // round down to the page for madvise
  uintptr_t addr = reinterpret_cast<uintptr_t>(p);
  uintptr_t page = addr & ~static_cast<uintptr_t>(4095);
  size_t len = static_cast<size_t>(f->frame_bytes) * count + (addr - page);
  madvise(reinterpret_cast<void*>(page), len, MADV_WILLNEED);
  return 0;
}

// Copy frames [start, start+count) into out (count*frame_bytes bytes).
int ser_read(void* handle, uint32_t start, uint32_t count, uint8_t* out) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f || start + count > f->frame_count) return -1;
  const uint8_t* src =
      f->map + kHeaderSize + static_cast<int64_t>(start) * f->frame_bytes;
  memcpy(out, src, static_cast<size_t>(f->frame_bytes) * count);
  return 0;
}

// Zero-copy pointer to frame payload (valid until ser_close).
const uint8_t* ser_data(void* handle) {
  SerFile* f = static_cast<SerFile*>(handle);
  return f ? f->map + kHeaderSize : nullptr;
}

void ser_close(void* handle) {
  SerFile* f = static_cast<SerFile*>(handle);
  if (!f) return;
  munmap(const_cast<uint8_t*>(f->map), f->file_size);
  close(f->fd);
  delete f;
}

}  // extern "C"
