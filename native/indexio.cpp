// indexio: native binary index file IO for ragfin_tpu.
//
// Replaces compressed-npz persistence for large corpora (at 10M chunks the
// packed matrix is gigabytes; zlib-compressing it takes minutes while raw
// sequential IO takes seconds). Format "RGFI" v1:
//
//   offset  size  field
//   0       4     magic "RGFI"
//   4       4     version (u32 LE) = 1
//   8       4     dtype code (u32 LE): 0=f32, 1=bf16, 2=int8
//   12      4     rows D (u32 LE)
//   16      8     cols N (u64 LE)
//   24      8     payload byte length (u64 LE)
//   32      4     CRC32 of payload (u32 LE)
//   36      4     reserved
//   40      ...   payload (row-major [D, N])
//
// CRC32 gives integrity checking numpy's tofile/fromfile lacks — a truncated
// or bit-flipped index file fails loudly at load instead of serving garbage.
// Bound via ctypes (ragfin_tpu/utils/indexio.py).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr uint32_t kMagic = 0x49464752;  // "RGFI" little-endian
constexpr uint32_t kVersion = 1;

// Table built at load time (constexpr): ctypes calls release the GIL, so a
// lazily-initialized table guarded by a plain bool is a data race when two
// serving threads make their first indexio call concurrently — a torn table
// computes wrong CRCs (spurious "corrupt file" on good data).
struct Crc32Table {
  uint32_t t[256];
  constexpr Crc32Table() : t() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      t[i] = c;
    }
  }
};
constexpr Crc32Table crc32_table;

uint32_t crc32(const uint8_t* data, uint64_t len, uint32_t crc = 0) {
  crc = ~crc;
  for (uint64_t i = 0; i < len; ++i)
    crc = crc32_table.t[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t dtype;
  uint32_t rows;
  uint64_t cols;
  uint64_t payload_len;
  uint32_t crc;
  uint32_t reserved;
};
static_assert(sizeof(Header) == 40, "header must be 40 bytes");

}  // namespace

extern "C" {

// Write an index payload. Returns 0 on success, negative error codes.
int ragfin_index_write(const char* path, uint32_t dtype, uint32_t rows,
                       uint64_t cols, const uint8_t* payload,
                       uint64_t payload_len) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  Header h{kMagic, kVersion, dtype, rows, cols, payload_len,
           crc32(payload, payload_len), 0};
  int rc = 0;
  if (std::fwrite(&h, sizeof(h), 1, f) != 1) rc = -2;
  if (rc == 0 && payload_len &&
      std::fwrite(payload, 1, payload_len, f) != payload_len)
    rc = -3;
  if (std::fclose(f) != 0 && rc == 0) rc = -4;
  return rc;
}

// Read the header. Returns 0 on success; fills dtype/rows/cols/payload_len.
int ragfin_index_read_header(const char* path, uint32_t* dtype, uint32_t* rows,
                             uint64_t* cols, uint64_t* payload_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  int rc = 0;
  if (std::fread(&h, sizeof(h), 1, f) != 1) rc = -2;
  std::fclose(f);
  if (rc) return rc;
  if (h.magic != kMagic) return -5;
  if (h.version != kVersion) return -6;
  *dtype = h.dtype;
  *rows = h.rows;
  *cols = h.cols;
  *payload_len = h.payload_len;
  return 0;
}

// Read and checksum-verify the payload into a caller buffer of payload_len.
// Returns 0 on success; -7 on checksum mismatch; -8 on short read.
int ragfin_index_read_payload(const char* path, uint8_t* out,
                              uint64_t payload_len) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  int rc = 0;
  if (std::fread(&h, sizeof(h), 1, f) != 1) rc = -2;
  if (rc == 0 && h.payload_len != payload_len) rc = -8;
  if (rc == 0 && std::fread(out, 1, payload_len, f) != payload_len) rc = -8;
  std::fclose(f);
  if (rc) return rc;
  if (crc32(out, payload_len) != h.crc) return -7;
  return 0;
}

}  // extern "C"
