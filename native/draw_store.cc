// math_tpu native draw store: append-only binary log for MCMC draws.
//
// Runtime/IO component in C++ (the role Boost/TBB-backed native code plays
// in the reference): high-throughput, crash-safe persistence of sampler
// output at large chain counts, without holding the Python GIL hot path.
//
// Format (little-endian):
//   header:  magic "MTDS" | u32 version | u32 dtype(4=f32, 8=f64)
//            u64 n_chains | u64 dim
//   records: u64 n_draws_in_chunk | payload (n_draws * n_chains * dim elems)
//            | u32 crc32(payload)
//
// A torn final record (crash mid-write) is detected via length/crc and
// dropped on read — reads recover every complete chunk.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr char kMagic[4] = {'M', 'T', 'D', 'S'};
constexpr uint32_t kVersion = 1;

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  crc = ~crc;
  for (size_t i = 0; i < len; i++) crc = table[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

struct Writer {
  FILE* f = nullptr;
  uint64_t n_chains = 0, dim = 0;
  uint32_t dtype = 4;
};

struct Header {
  char magic[4];
  uint32_t version;
  uint32_t dtype;
  uint32_t pad;
  uint64_t n_chains;
  uint64_t dim;
};

}  // namespace

extern "C" {

// Returns an opaque handle, or null on failure.
void* mtds_writer_open(const char* path, uint64_t n_chains, uint64_t dim,
                       uint32_t elem_size) {
  if (elem_size != 4 && elem_size != 8) return nullptr;
  FILE* f = std::fopen(path, "ab");
  if (!f) return nullptr;
  long pos = std::ftell(f);
  if (pos == 0) {
    Header h{};
    std::memcpy(h.magic, kMagic, 4);
    h.version = kVersion;
    h.dtype = elem_size;
    h.n_chains = n_chains;
    h.dim = dim;
    if (std::fwrite(&h, sizeof(h), 1, f) != 1) {
      std::fclose(f);
      return nullptr;
    }
    std::fflush(f);
  }
  Writer* w = new Writer{f, n_chains, dim, elem_size};
  return w;
}

// data: n_draws * n_chains * dim elements, draw-major.
int mtds_writer_append(void* handle, const void* data, uint64_t n_draws) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  const size_t payload =
      static_cast<size_t>(n_draws) * w->n_chains * w->dim * w->dtype;
  uint32_t crc =
      crc32_update(0, static_cast<const uint8_t*>(data), payload);
  if (std::fwrite(&n_draws, sizeof(n_draws), 1, w->f) != 1) return -2;
  if (payload && std::fwrite(data, 1, payload, w->f) != payload) return -3;
  if (std::fwrite(&crc, sizeof(crc), 1, w->f) != 1) return -4;
  std::fflush(w->f);
  return 0;
}

void mtds_writer_close(void* handle) {
  Writer* w = static_cast<Writer*>(handle);
  if (!w) return;
  if (w->f) std::fclose(w->f);
  delete w;
}

// Reads metadata; returns 0 on success.
int mtds_read_meta(const char* path, uint64_t* n_chains, uint64_t* dim,
                   uint32_t* elem_size, uint64_t* n_draws) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h{};
  if (std::fread(&h, sizeof(h), 1, f) != 1 ||
      std::memcmp(h.magic, kMagic, 4) != 0 || h.version != kVersion) {
    std::fclose(f);
    return -2;
  }
  *n_chains = h.n_chains;
  *dim = h.dim;
  *elem_size = h.dtype;
  uint64_t total = 0;
  const size_t rec_elem = h.n_chains * h.dim * h.dtype;
  for (;;) {
    uint64_t nd = 0;
    if (std::fread(&nd, sizeof(nd), 1, f) != 1) break;
    const size_t payload = static_cast<size_t>(nd) * rec_elem;
    if (std::fseek(f, static_cast<long>(payload), SEEK_CUR) != 0) break;
    uint32_t crc = 0;
    if (std::fread(&crc, sizeof(crc), 1, f) != 1) break;  // torn record
    total += nd;
  }
  std::fclose(f);
  *n_draws = total;
  return 0;
}

// out must hold n_draws * n_chains * dim elements (from mtds_read_meta).
// Returns number of draws read (complete, crc-valid chunks only), or <0.
int64_t mtds_read_all(const char* path, void* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h{};
  if (std::fread(&h, sizeof(h), 1, f) != 1 ||
      std::memcmp(h.magic, kMagic, 4) != 0) {
    std::fclose(f);
    return -2;
  }
  const size_t rec_elem = h.n_chains * h.dim * h.dtype;
  uint8_t* dst = static_cast<uint8_t*>(out);
  uint64_t total = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint64_t nd = 0;
    if (std::fread(&nd, sizeof(nd), 1, f) != 1) break;
    const size_t payload = static_cast<size_t>(nd) * rec_elem;
    buf.resize(payload);
    if (payload && std::fread(buf.data(), 1, payload, f) != payload) break;
    uint32_t crc_file = 0;
    if (std::fread(&crc_file, sizeof(crc_file), 1, f) != 1) break;
    if (crc32_update(0, buf.data(), payload) != crc_file) break;
    std::memcpy(dst, buf.data(), payload);
    dst += payload;
    total += nd;
  }
  std::fclose(f);
  return static_cast<int64_t>(total);
}

}  // extern "C"
