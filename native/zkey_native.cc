// Native ingest path for snarkjs container files.
//
// Plays the role of the reference's mmap-based FileWrapper +
// rayon-parallel coefficient decode (/root/reference/src/file_wrapper.rs:45-208,
// /root/reference/src/cache.rs:126-166): zero-copy section access via
// mmap, single-pass coefficient-record decode, and the R1CS-plan radix
// sort that orders records by output slot. Exposed as a C ABI consumed
// through ctypes (io/native.py); the pure-numpy path remains as the
// fallback and differential reference.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Section {
  uint32_t id;
  uint64_t offset;  // into the mapped file
  uint64_t size;
};

struct MappedFile {
  uint8_t* data = nullptr;
  size_t size = 0;
  Section sections[64];
  int n_sections = 0;
};

}  // namespace

extern "C" {

// Open + mmap a snarkjs container, verify magic, build the section
// table. Returns an opaque handle (nullptr on failure).
void* zkey_open(const char* path, const char* magic4) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 12) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return nullptr;

  auto* mf = new MappedFile();
  mf->data = static_cast<uint8_t*>(map);
  mf->size = st.st_size;

  if (memcmp(mf->data, magic4, 4) != 0) {
    munmap(map, st.st_size);
    delete mf;
    return nullptr;
  }
  uint32_t n_sections;
  memcpy(&n_sections, mf->data + 8, 4);
  uint64_t pos = 12;
  for (uint32_t i = 0; i < n_sections && i < 64; i++) {
    if (pos + 12 > mf->size) break;
    uint32_t id;
    uint64_t size;
    memcpy(&id, mf->data + pos, 4);
    memcpy(&size, mf->data + pos + 4, 8);
    pos += 12;
    if (pos + size > mf->size) break;
    mf->sections[mf->n_sections++] = Section{id, pos, size};
    pos += size;
  }
  return mf;
}

void zkey_close(void* handle) {
  auto* mf = static_cast<MappedFile*>(handle);
  if (!mf) return;
  munmap(mf->data, mf->size);
  delete mf;
}

// Section lookup: returns the pointer into the mapping (zero copy) and
// writes the byte size; nullptr if the id is absent.
const uint8_t* zkey_section(void* handle, uint32_t id, uint64_t* size_out) {
  auto* mf = static_cast<MappedFile*>(handle);
  for (int i = 0; i < mf->n_sections; i++) {
    if (mf->sections[i].id == id) {
      *size_out = mf->sections[i].size;
      return mf->data + mf->sections[i].offset;
    }
  }
  *size_out = 0;
  return nullptr;
}

// Decode section-4 coefficient records (m u32, c u32, s u32,
// coef n8r bytes) into columnar arrays, and simultaneously build the
// R1CS evaluation plan: records sorted by out_slot = m*domain + c
// (stable LSD radix sort on the slot, 3 x 11-bit passes).
//
// Outputs (caller-allocated, length n_coef):
//   s_sorted   u32   witness gather indices, plan order
//   slot_sorted i64  output slots, plan order
//   coef_sorted u32  n_coef x (n8r/4) words, plan order
// Returns n_coef.
int64_t zkey_decode_plan(const uint8_t* section, uint64_t size,
                         uint32_t n8r, uint64_t domain_size,
                         uint32_t* s_sorted, int64_t* slot_sorted,
                         uint32_t* coef_sorted) {
  const uint64_t s_coef = 12 + n8r;
  const int64_t n = (int64_t)((size - 4) / s_coef);
  const uint8_t* body = section + 4;
  const int words = n8r / 4;

  // pass 0: decode slots
  int64_t* slots = new int64_t[n];
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* rec = body + i * s_coef;
    uint32_t m, c;
    memcpy(&m, rec, 4);
    memcpy(&c, rec + 4, 4);
    slots[i] = (int64_t)m * (int64_t)domain_size + (int64_t)c;
  }

  // stable LSD radix sort of indices by slot (3 x 11-bit digits covers
  // slots < 2^33, i.e. domains up to 2^32)
  int64_t* idx = new int64_t[n];
  int64_t* tmp = new int64_t[n];
  for (int64_t i = 0; i < n; i++) idx[i] = i;
  constexpr int BITS = 11;
  constexpr int BUCKETS = 1 << BITS;
  int64_t count[BUCKETS];
  for (int pass = 0; pass < 3; pass++) {
    const int shift = pass * BITS;
    memset(count, 0, sizeof(count));
    for (int64_t i = 0; i < n; i++)
      count[(slots[idx[i]] >> shift) & (BUCKETS - 1)]++;
    int64_t sum = 0;
    for (int b = 0; b < BUCKETS; b++) {
      int64_t c0 = count[b];
      count[b] = sum;
      sum += c0;
    }
    for (int64_t i = 0; i < n; i++)
      tmp[count[(slots[idx[i]] >> shift) & (BUCKETS - 1)]++] = idx[i];
    int64_t* t = idx;
    idx = tmp;
    tmp = t;
  }

  // emit plan-ordered columns
  for (int64_t j = 0; j < n; j++) {
    const int64_t i = idx[j];
    const uint8_t* rec = body + i * s_coef;
    memcpy(&s_sorted[j], rec + 8, 4);
    slot_sorted[j] = slots[i];
    memcpy(&coef_sorted[(uint64_t)j * words], rec + 12, n8r);
  }

  delete[] slots;
  delete[] idx;
  delete[] tmp;
  return n;
}

}  // extern "C"
