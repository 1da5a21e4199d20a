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
// Sequential reads are offset-cursor based with the cursor owned by the
// *caller* (explog_read_frame takes and returns the offset), so multiple
// iterators over one handle cannot corrupt each other's position.
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
};

struct FileHeader {
  uint32_t magic;
  uint32_t version;
};

// Reads and validates one frame at byte offset `off`.  On success fills
// `rh`/`payload` (payload excludes the RecordHeader) and sets `next` to the
// offset just past the frame; returns 0.  Returns 1 on EOF or a torn /
// corrupt / inconsistent frame (scan stops there).  Caller holds the lock.
int read_frame_at(FILE* f, long off, RecordHeader* rh,
                  std::vector<uint8_t>* payload, long* next) {
  std::fseek(f, off, SEEK_SET);
  uint32_t len = 0, crc = 0;
  if (std::fread(&len, sizeof len, 1, f) != 1) return 1;
  if (len < sizeof(RecordHeader) || len > (1u << 28)) return 1;
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != len) return 1;
  if (std::fread(&crc, sizeof crc, 1, f) != 1) return 1;
  if (crc32(buf.data(), len) != crc) return 1;

  std::memcpy(rh, buf.data(), sizeof *rh);
  // length-consistency: a CRC-valid frame whose declared array sizes do not
  // match the payload size is treated as corruption, never over-read
  const uint64_t want = sizeof(RecordHeader) + 4 * sizeof(double) +
                        (uint64_t(rh->n_states) + rh->n_controls) * sizeof(double);
  if (want != len) return 1;
  payload->assign(buf.begin() + sizeof(RecordHeader), buf.end());
  if (next) *next = off + long(sizeof len) + long(len) + long(sizeof crc);
  return 0;
}

void unpack_payload(const RecordHeader& rh, const std::vector<uint8_t>& payload,
                    double* start_pos, double* X, double* U) {
  const uint8_t* p = payload.data();
  std::memcpy(start_pos, p, 4 * sizeof(double));
  p += 4 * sizeof(double);
  std::memcpy(X, p, rh.n_states * sizeof(double));
  p += rh.n_states * sizeof(double);
  std::memcpy(U, p, rh.n_controls * sizeof(double));
}

}  // namespace

extern "C" {

// Byte offset of the first frame (the initial read cursor).
long explog_data_start(void) { return sizeof(FileHeader); }

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
  // reads may have moved the shared FILE position ("w+b" honors it)
  std::fseek(lg->f, 0, SEEK_END);

  RecordHeader rh{start_time, planning_time, n_states, n_controls};
  std::vector<uint8_t> buf(sizeof rh + 4 * sizeof(double) +
                           (size_t(n_states) + n_controls) * sizeof(double));
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
  long off = sizeof(FileHeader);
  int64_t count = 0;
  RecordHeader rh;
  std::vector<uint8_t> payload;
  while (read_frame_at(lg->f, off, &rh, &payload, &off) == 0) ++count;
  return count;
}

// Reads record `index`'s sizes. Returns 0 on success.
int explog_record_sizes(void* handle, int64_t index, uint32_t* n_states,
                        uint32_t* n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  long off = sizeof(FileHeader);
  RecordHeader rh;
  std::vector<uint8_t> payload;
  for (int64_t i = 0;; ++i) {
    if (read_frame_at(lg->f, off, &rh, &payload, &off) != 0) return -2;
    if (i == index) {
      *n_states = rh.n_states;
      *n_controls = rh.n_controls;
      return 0;
    }
  }
}

// Reads record `index` into caller-allocated buffers. Returns 0 on success.
int explog_read(void* handle, int64_t index, double* start_time,
                double* start_pos, double* planning_time, double* X,
                uint32_t n_states, double* U, uint32_t n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  long off = sizeof(FileHeader);
  RecordHeader rh;
  std::vector<uint8_t> payload;
  for (int64_t i = 0;; ++i) {
    if (read_frame_at(lg->f, off, &rh, &payload, &off) != 0) return -2;
    if (i != index) continue;
    if (rh.n_states != n_states || rh.n_controls != n_controls) return -3;
    *start_time = rh.start_time;
    *planning_time = rh.planning_time;
    unpack_payload(rh, payload, start_pos, X, U);
    return 0;
  }
}

// Sequential reader with a CALLER-owned offset cursor: start at
// explog_data_start(), pass the returned next_off back in.  Returns 0 on
// success, 1 at end-of-log/corrupt tail.
int explog_frame_sizes(void* handle, long off, uint32_t* n_states,
                       uint32_t* n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  RecordHeader rh;
  std::vector<uint8_t> payload;
  if (read_frame_at(lg->f, off, &rh, &payload, nullptr) != 0) return 1;
  *n_states = rh.n_states;
  *n_controls = rh.n_controls;
  return 0;
}

int explog_read_frame(void* handle, long off, long* next_off,
                      double* start_time, double* start_pos,
                      double* planning_time, double* X, uint32_t n_states,
                      double* U, uint32_t n_controls) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return -1;
  std::lock_guard<std::mutex> lock(lg->mu);
  RecordHeader rh;
  std::vector<uint8_t> payload;
  if (read_frame_at(lg->f, off, &rh, &payload, next_off) != 0) return 1;
  if (rh.n_states != n_states || rh.n_controls != n_controls) return -3;
  *start_time = rh.start_time;
  *planning_time = rh.planning_time;
  unpack_payload(rh, payload, start_pos, X, U);
  return 0;
}

void explog_close(void* handle) {
  auto* lg = static_cast<Log*>(handle);
  if (!lg) return;
  if (lg->f) std::fclose(lg->f);
  delete lg;
}

}  // extern "C"
