// Experiment log engine — the framework's native equivalent of the
// reference's persistence layer (`rosbag record /experiment`,
// CILQR/src/README.md:50-55, payload vehiclepub/msg/Experiment.msg:1-6:
// start_time, start_pos[4], planning_time, X[], U[]).
//
// Append-only binary log with CRC32-framed records; a torn/corrupt tail is
// detected and truncated on read (the property rosbag gives via its chunked
// format).  Exposed through a C ABI consumed by ctypes
// (cilqr_tpu/utils/explog.py) — no pybind11 in this image.
//
// Build: make -C native   (produces native/libexplog.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x43514C47;  // "CQLG"
constexpr uint32_t kVersion = 1;

uint32_t crc32(const uint8_t* data, size_t n, uint32_t crc = 0xFFFFFFFFu) {
  // standard reflected CRC-32 (poly 0xEDB88320), tableless bitwise form —
  // log records are small, simplicity beats a 1 KiB table here
  for (size_t i = 0; i < n; ++i) {
    crc ^= data[i];
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ (0xEDB88320u & (0u - (crc & 1u)));
  }
  return crc;
}

struct RecordHeader {
  double start_time;
  double planning_time;
  uint32_t n_states;   // X length (doubles)
  uint32_t n_controls; // U length (doubles)
};

struct Log {
  FILE* f = nullptr;
  std::mutex mu;
  bool writable = false;
  long cursor = 0;  // byte offset of the sequential reader
};

struct FileHeader {
  uint32_t magic;
  uint32_t version;
};

}  // namespace

extern "C" {

// Returns an opaque handle or nullptr. mode: 0 = write (truncate), 1 = read,
// 2 = append.
void* explog_open(const char* path, int mode) {
  auto* lg = new Log();
  // write modes open read+write: count/read scan the same FILE*
  const char* fmode = mode == 0 ? "w+b" : (mode == 1 ? "rb" : "a+b");
  lg->f = std::fopen(path, fmode);
  if (!lg->f) {
    delete lg;
    return nullptr;
  }
  lg->writable = mode != 1;
  if (mode == 0) {
    FileHeader h{kMagic, kVersion};
    std::fwrite(&h, sizeof h, 1, lg->f);
  } else if (mode == 2) {
    std::fseek(lg->f, 0, SEEK_END);
    if (std::ftell(lg->f) == 0) {
      FileHeader h{kMagic, kVersion};
      std::fwrite(&h, sizeof h, 1, lg->f);
    }
  } else {
    FileHeader h{};
    if (std::fread(&h, sizeof h, 1, lg->f) != 1 || h.magic != kMagic ||
        h.version != kVersion) {
      std::fclose(lg->f);
      delete lg;
      return nullptr;
    }
  }
  return lg;
}

// Appends one record. Returns 0 on success.
int explog_append(void* handle, double start_time, const double* start_pos,
                  double planning_time, const double* X, uint32_t n_states,
                  const double* U, uint32_t n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg || !lg->writable) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);

  RecordHeader rh{start_time, planning_time, n_states, n_controls};
  std::vector<uint8_t> buf(sizeof rh + 4 * sizeof(double) +
                           (n_states + n_controls) * sizeof(double));
  uint8_t* p = buf.data();
  std::memcpy(p, &rh, sizeof rh);
  p += sizeof rh;
  std::memcpy(p, start_pos, 4 * sizeof(double));
  p += 4 * sizeof(double);
  std::memcpy(p, X, n_states * sizeof(double));
  p += n_states * sizeof(double);
  std::memcpy(p, U, n_controls * sizeof(double));

  uint32_t len = static_cast<uint32_t>(buf.size());
  uint32_t crc = crc32(buf.data(), buf.size());
  if (std::fwrite(&len, sizeof len, 1, lg->f) != 1) return -2;
  if (std::fwrite(buf.data(), 1, buf.size(), lg->f) != buf.size()) return -2;
  if (std::fwrite(&crc, sizeof crc, 1, lg->f) != 1) return -2;
  return 0;
}

int explog_flush(void* handle) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  return std::fflush(lg->f);
}

// Counts valid records (stops at the first corrupt/torn frame).
int64_t explog_count(void* handle) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  long pos = std::ftell(lg->f);
  std::fseek(lg->f, sizeof(FileHeader), SEEK_SET);
  int64_t count = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint32_t len = 0, crc = 0;
    if (std::fread(&len, sizeof len, 1, lg->f) != 1) break;
    if (len < sizeof(RecordHeader) || len > (1u << 28)) break;
    buf.resize(len);
    if (std::fread(buf.data(), 1, len, lg->f) != len) break;
    if (std::fread(&crc, sizeof crc, 1, lg->f) != 1) break;
    if (crc32(buf.data(), len) != crc) break;
    ++count;
  }
  std::fseek(lg->f, pos, SEEK_SET);
  return count;
}

// Reads record i sizes into (n_states, n_controls); returns 0 on success.
int explog_record_sizes(void* handle, int64_t index, uint32_t* n_states,
                        uint32_t* n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  std::fseek(lg->f, sizeof(FileHeader), SEEK_SET);
  std::vector<uint8_t> buf;
  for (int64_t i = 0;; ++i) {
    uint32_t len = 0, crc = 0;
    if (std::fread(&len, sizeof len, 1, lg->f) != 1) return -2;
    if (len < sizeof(RecordHeader) || len > (1u << 28)) return -2;
    buf.resize(len);
    if (std::fread(buf.data(), 1, len, lg->f) != len) return -2;
    if (std::fread(&crc, sizeof crc, 1, lg->f) != 1) return -2;
    if (crc32(buf.data(), len) != crc) return -2;
    if (i == index) {
      RecordHeader rh;
      std::memcpy(&rh, buf.data(), sizeof rh);
      *n_states = rh.n_states;
      *n_controls = rh.n_controls;
      return 0;
    }
  }
}

// Reads record i into caller-allocated buffers. Returns 0 on success.
int explog_read(void* handle, int64_t index, double* start_time,
                double* start_pos, double* planning_time, double* X,
                uint32_t n_states, double* U, uint32_t n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  std::fseek(lg->f, sizeof(FileHeader), SEEK_SET);
  std::vector<uint8_t> buf;
  for (int64_t i = 0;; ++i) {
    uint32_t len = 0, crc = 0;
    if (std::fread(&len, sizeof len, 1, lg->f) != 1) return -2;
    if (len < sizeof(RecordHeader) || len > (1u << 28)) return -2;
    buf.resize(len);
    if (std::fread(buf.data(), 1, len, lg->f) != len) return -2;
    if (std::fread(&crc, sizeof crc, 1, lg->f) != 1) return -2;
    if (crc32(buf.data(), len) != crc) return -2;
    if (i != index) continue;

    RecordHeader rh;
    const uint8_t* p = buf.data();
    std::memcpy(&rh, p, sizeof rh);
    p += sizeof rh;
    if (rh.n_states != n_states || rh.n_controls != n_controls) return -3;
    *start_time = rh.start_time;
    *planning_time = rh.planning_time;
    std::memcpy(start_pos, p, 4 * sizeof(double));
    p += 4 * sizeof(double);
    std::memcpy(X, p, n_states * sizeof(double));
    p += n_states * sizeof(double);
    std::memcpy(U, p, n_controls * sizeof(double));
    return 0;
  }
}

// Sequential reader: rewind, then read_next until it returns 1 (EOF/corrupt
// tail) — O(1) per record vs the indexed explog_read's O(n) rescan.
void explog_rewind(void* handle) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return;
  std::lock_guard<std::mutex> lock(lg->mu);
  lg->cursor = sizeof(FileHeader);
}

// Returns 0 on success, 1 at end-of-log, negative on usage errors.
// Buffer sizes must match the record (query via explog_next_sizes first).
int explog_next_sizes(void* handle, uint32_t* n_states, uint32_t* n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  std::fseek(lg->f, lg->cursor, SEEK_SET);
  uint32_t len = 0;
  if (std::fread(&len, sizeof len, 1, lg->f) != 1) return 1;
  if (len < sizeof(RecordHeader) || len > (1u << 28)) return 1;
  RecordHeader rh;
  if (std::fread(&rh, sizeof rh, 1, lg->f) != 1) return 1;
  *n_states = rh.n_states;
  *n_controls = rh.n_controls;
  return 0;
}

int explog_read_next(void* handle, double* start_time, double* start_pos,
                     double* planning_time, double* X, uint32_t n_states,
                     double* U, uint32_t n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  std::fseek(lg->f, lg->cursor, SEEK_SET);
  uint32_t len = 0, crc = 0;
  if (std::fread(&len, sizeof len, 1, lg->f) != 1) return 1;
  if (len < sizeof(RecordHeader) || len > (1u << 28)) return 1;
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, lg->f) != len) return 1;
  if (std::fread(&crc, sizeof crc, 1, lg->f) != 1) return 1;
  if (crc32(buf.data(), len) != crc) return 1;

  RecordHeader rh;
  const uint8_t* pcur = buf.data();
  std::memcpy(&rh, pcur, sizeof rh);
  pcur += sizeof rh;
  if (rh.n_states != n_states || rh.n_controls != n_controls) return -3;
  *start_time = rh.start_time;
  *planning_time = rh.planning_time;
  std::memcpy(start_pos, pcur, 4 * sizeof(double));
  pcur += 4 * sizeof(double);
  std::memcpy(X, pcur, n_states * sizeof(double));
  pcur += n_states * sizeof(double);
  std::memcpy(U, pcur, n_controls * sizeof(double));
  lg->cursor = std::ftell(lg->f);
  return 0;
}

void explog_close(void* handle) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return;
  if (lg->f) std::fclose(lg->f);
  delete lg;
}

}  // extern "C"
