// mila_io — native data-path library for mila_tpu.
//
// Parity: the reference's C++ data layer (DatasetReader/DatasetLoader.ixx,
// MnistDataLoader.ixx, Gpt2DataLoader.ixx, CharDataLoader.ixx) is native
// C++; this library is its TPU-framework equivalent: mmap'd shard parsing
// and OpenMP-parallel batch-window gathering feeding the host→HBM staging
// path. Python binds via ctypes (mila_tpu/native.py) with a numpy fallback.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// IDX (MNIST) parsing
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct MappedFile {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
};

static bool map_file(const char* path, MappedFile* mf) {
  mf->fd = open(path, O_RDONLY);
  if (mf->fd < 0) return false;
  struct stat st;
  if (fstat(mf->fd, &st) != 0 || st.st_size <= 0) {
    close(mf->fd);
    return false;
  }
  mf->size = size_t(st.st_size);
  void* p = mmap(nullptr, mf->size, PROT_READ, MAP_PRIVATE, mf->fd, 0);
  if (p == MAP_FAILED) {
    close(mf->fd);
    return false;
  }
  mf->data = static_cast<const uint8_t*>(p);
  return true;
}

static void unmap_file(MappedFile* mf) {
  if (mf->data) munmap(const_cast<uint8_t*>(mf->data), mf->size);
  if (mf->fd >= 0) close(mf->fd);
}

// Returns number of images written, or -1 on error. out has room for
// max_n * rows * cols floats; images normalized to [0, 1].
int64_t mila_read_idx_images(const char* path, float* out, int64_t max_n,
                             int32_t* rows_out, int32_t* cols_out) {
  MappedFile mf;
  if (!map_file(path, &mf)) return -1;
  int64_t result = -1;
  if (mf.size >= 16 && be32(mf.data) == 2051) {
    int64_t n = be32(mf.data + 4);
    int64_t rows = be32(mf.data + 8);
    int64_t cols = be32(mf.data + 12);
    int64_t take = std::min(n, max_n);
    if (mf.size >= 16 + size_t(n * rows * cols)) {
      const uint8_t* px = mf.data + 16;
      const int64_t stride = rows * cols;
      const float inv = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
      for (int64_t i = 0; i < take; ++i) {
        const uint8_t* src = px + i * stride;
        float* dst = out + i * stride;
        for (int64_t j = 0; j < stride; ++j) dst[j] = float(src[j]) * inv;
      }
      *rows_out = int32_t(rows);
      *cols_out = int32_t(cols);
      result = take;
    }
  }
  unmap_file(&mf);
  return result;
}

int64_t mila_read_idx_labels(const char* path, int32_t* out, int64_t max_n) {
  MappedFile mf;
  if (!map_file(path, &mf)) return -1;
  int64_t result = -1;
  if (mf.size >= 8 && be32(mf.data) == 2049) {
    int64_t n = be32(mf.data + 4);
    int64_t take = std::min(n, max_n);
    if (mf.size >= 8 + size_t(n)) {
      const uint8_t* lab = mf.data + 8;
      for (int64_t i = 0; i < take; ++i) out[i] = int32_t(lab[i]);
      result = take;
    }
  }
  unmap_file(&mf);
  return result;
}

// ---------------------------------------------------------------------------
// Token shards (llm.c format / raw u16 / raw i32)
// ---------------------------------------------------------------------------

// Returns token count written (-1 error). Detects llm.c magic 20240520
// (256-int32 header + uint16 payload), else raw int32 when plausible,
// else raw uint16.
int64_t mila_read_token_file(const char* path, int32_t* out, int64_t cap) {
  MappedFile mf;
  if (!map_file(path, &mf)) return -1;
  int64_t count = -1;
  const uint8_t* d = mf.data;
  if (mf.size >= 1024) {
    int32_t magic;
    std::memcpy(&magic, d, 4);
    if (magic == 20240520) {
      int32_t ntok;
      std::memcpy(&ntok, d + 8, 4);
      int64_t take = std::min<int64_t>(ntok, cap);
      if (mf.size >= 1024 + size_t(ntok) * 2) {
        const uint16_t* toks = reinterpret_cast<const uint16_t*>(d + 1024);
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < take; ++i) out[i] = int32_t(toks[i]);
        count = take;
      }
      unmap_file(&mf);
      return count;
    }
  }
  if (mf.size % 4 == 0) {
    const int32_t* v = reinterpret_cast<const int32_t*>(d);
    int64_t n = int64_t(mf.size / 4);
    bool plausible = true;
    for (int64_t i = 0; i < std::min<int64_t>(n, 4096); ++i) {
      if (v[i] < 0 || v[i] >= 1000000) {
        plausible = false;
        break;
      }
    }
    if (plausible) {
      int64_t take = std::min(n, cap);
      std::memcpy(out, v, size_t(take) * 4);
      unmap_file(&mf);
      return take;
    }
  }
  {
    const uint16_t* v = reinterpret_cast<const uint16_t*>(d);
    int64_t n = int64_t(mf.size / 2);
    int64_t take = std::min(n, cap);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < take; ++i) out[i] = int32_t(v[i]);
    count = take;
  }
  unmap_file(&mf);
  return count;
}

// ---------------------------------------------------------------------------
// Batch-window gathering (TokenReader/CharReader hot loop)
// ---------------------------------------------------------------------------

// x[b, t] = tokens[starts[b] + t]; y[b, t] = tokens[starts[b] + t + 1].
void mila_gather_windows(const int32_t* tokens, int64_t n_tokens,
                         const int64_t* starts, int32_t batch, int32_t seqlen,
                         int32_t* x, int32_t* y) {
#pragma omp parallel for schedule(static)
  for (int32_t b = 0; b < batch; ++b) {
    int64_t s = starts[b];
    if (s < 0 || s + seqlen + 1 > n_tokens) continue;  // caller validates
    std::memcpy(x + int64_t(b) * seqlen, tokens + s, size_t(seqlen) * 4);
    std::memcpy(y + int64_t(b) * seqlen, tokens + s + 1, size_t(seqlen) * 4);
  }
}

// Byte→id LUT encode (CharVocabulary hot path).
void mila_lut_encode(const uint8_t* bytes, int64_t n, const int32_t* lut256,
                     int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = lut256[bytes[i]];
}

int mila_io_version() { return 1; }

}  // extern "C"
