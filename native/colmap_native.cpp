// Native COLMAP binary parsers (the framework's data-loader fast path).
//
// The reference reads sparse reconstructions with per-record Python struct
// loops (scene/colmap_loader.py:83-261) — minutes for multi-million-point
// scenes. This C++ module mmaps the file and parses in one pass; exposed to
// Python over a plain C ABI via ctypes (no pybind11 in the image).
//
// Two-phase API: *_count() scans and returns record count; *_fill() parses
// into caller-allocated buffers. Returns negative on error.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0) { close(m.fd); m.fd = -1; return m; }
  m.size = static_cast<size_t>(st.st_size);
  void* p = mmap(nullptr, m.size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) { close(m.fd); m.fd = -1; return m; }
  m.data = static_cast<const uint8_t*>(p);
  return m;
}

void unmap(Mapped& m) {
  if (m.data) munmap(const_cast<uint8_t*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
  m.data = nullptr;
}

template <typename T>
bool read_at(const Mapped& m, size_t& off, T* out) {
  if (off + sizeof(T) > m.size) return false;
  std::memcpy(out, m.data + off, sizeof(T));
  off += sizeof(T);
  return true;
}

}  // namespace

extern "C" {

// points3D.bin: u64 count; per point: u64 id, f64 xyz[3], u8 rgb[3],
// f64 error, u64 track_len, (i32, i32) * track_len
int64_t radegs_points3d_count(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  size_t off = 0;
  uint64_t n = 0;
  bool ok = read_at(m, off, &n);
  unmap(m);
  return ok ? static_cast<int64_t>(n) : -2;
}

// fills xyz (n*3 f64), rgb (n*3 u8), err (n f64), ids (n i64)
int64_t radegs_points3d_fill(const char* path, double* xyz, uint8_t* rgb,
                             double* err, int64_t* ids, int64_t capacity) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  size_t off = 0;
  uint64_t n = 0;
  if (!read_at(m, off, &n) || static_cast<int64_t>(n) > capacity) {
    unmap(m);
    return -2;
  }
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t id;
    if (!read_at(m, off, &id)) { unmap(m); return -3; }
    ids[i] = static_cast<int64_t>(id);
    if (off + 3 * sizeof(double) + 3 + sizeof(double) > m.size) { unmap(m); return -3; }
    std::memcpy(xyz + 3 * i, m.data + off, 3 * sizeof(double));
    off += 3 * sizeof(double);
    std::memcpy(rgb + 3 * i, m.data + off, 3);
    off += 3;
    std::memcpy(err + i, m.data + off, sizeof(double));
    off += sizeof(double);
    uint64_t track = 0;
    if (!read_at(m, off, &track)) { unmap(m); return -3; }
    off += track * 8;  // (image_id i32, point2D_idx i32)
    if (off > m.size) { unmap(m); return -3; }
  }
  unmap(m);
  return static_cast<int64_t>(n);
}

// images.bin: u64 count; per image: i32 id, f64 q[4], f64 t[3], i32 cam_id,
// cstring name, u64 n2d, (f64, f64, i64) * n2d
int64_t radegs_images_count(const char* path) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  size_t off = 0;
  uint64_t n = 0;
  bool ok = read_at(m, off, &n);
  unmap(m);
  return ok ? static_cast<int64_t>(n) : -2;
}

// fills ids (n i32), qvec (n*4 f64), tvec (n*3 f64), cam_ids (n i32),
// names (n*max_name char, NUL padded)
int64_t radegs_images_fill(const char* path, int32_t* ids, double* qvec,
                           double* tvec, int32_t* cam_ids, char* names,
                           int64_t max_name, int64_t capacity) {
  Mapped m = map_file(path);
  if (!m.ok()) return -1;
  size_t off = 0;
  uint64_t n = 0;
  if (!read_at(m, off, &n) || static_cast<int64_t>(n) > capacity) {
    unmap(m);
    return -2;
  }
  for (uint64_t i = 0; i < n; ++i) {
    if (!read_at(m, off, &ids[i])) { unmap(m); return -3; }
    if (off + 7 * sizeof(double) + sizeof(int32_t) > m.size) { unmap(m); return -3; }
    std::memcpy(qvec + 4 * i, m.data + off, 4 * sizeof(double));
    off += 4 * sizeof(double);
    std::memcpy(tvec + 3 * i, m.data + off, 3 * sizeof(double));
    off += 3 * sizeof(double);
    std::memcpy(&cam_ids[i], m.data + off, sizeof(int32_t));
    off += sizeof(int32_t);
    // NUL-terminated name
    size_t start = off;
    while (off < m.size && m.data[off] != 0) ++off;
    if (off >= m.size) { unmap(m); return -3; }
    size_t len = off - start;
    if (static_cast<int64_t>(len) >= max_name) len = max_name - 1;
    std::memset(names + max_name * i, 0, max_name);
    std::memcpy(names + max_name * i, m.data + start, len);
    ++off;  // NUL
    uint64_t n2d = 0;
    if (!read_at(m, off, &n2d)) { unmap(m); return -3; }
    off += n2d * 24;  // x f64, y f64, id i64
    if (off > m.size) { unmap(m); return -3; }
  }
  unmap(m);
  return static_cast<int64_t>(n);
}

}  // extern "C"
