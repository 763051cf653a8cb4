// mila_bpe — native byte-level BPE encoder for mila_tpu.
//
// Parity: the reference ships a decode-only tokenizer (Gpt2/Src/
// Tokenizer.ixx reads gpt2_tokenizer.bin); encode is listed on its roadmap.
// This library provides the encode side natively: GPT-2-style
// pre-tokenization (ASCII approximation of the \p{L}/\p{N} regex) followed
// by ranked pair merging. Python binds via ctypes (mila_tpu/data/bpe.py)
// with an identical pure-python fallback — tests assert native == python.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  std::vector<std::string> vocab;              // id -> bytes
  std::unordered_map<std::string, int32_t> lookup;  // bytes -> id
  // (a << 32 | b) -> (rank << 32 | merged_id)
  std::unordered_map<uint64_t, uint64_t> ranks;
  int32_t byte_to_id[256];
};

inline uint64_t pair_key(int32_t a, int32_t b) {
  return (uint64_t(uint32_t(a)) << 32) | uint32_t(b);
}

inline bool is_letter(uint8_t c) {
  // Non-ASCII bytes (UTF-8 continuation/lead) are grouped with letters —
  // the ASCII approximation of \p{L} documented in the python wrapper.
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c >= 0x80;
}
inline bool is_digit(uint8_t c) { return c >= '0' && c <= '9'; }
inline bool is_space(uint8_t c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

// GPT-2-style pre-tokenizer (ASCII approximation): contractions,
// " ?letters+", " ?digits+", " ?punct+", whitespace runs (trailing space
// attaches to the next word).
size_t next_pretoken(const uint8_t* s, size_t n, size_t i) {
  if (i >= n) return i;
  // Contractions: 's 't 're 've 'm 'll 'd
  if (s[i] == '\'' && i + 1 < n) {
    uint8_t c1 = s[i + 1] | 0x20;
    if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') return i + 2;
    if (i + 2 < n) {
      uint8_t c2 = s[i + 2] | 0x20;
      if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
          (c1 == 'l' && c2 == 'l'))
        return i + 3;
    }
  }
  size_t j = i;
  bool leading_space = false;
  if (s[j] == ' ' && j + 1 < n && !is_space(s[j + 1])) {
    leading_space = true;
    ++j;
  }
  if (j < n && is_letter(s[j])) {
    while (j < n && is_letter(s[j])) ++j;
    return j;
  }
  if (j < n && is_digit(s[j])) {
    while (j < n && is_digit(s[j])) ++j;
    return j;
  }
  if (j < n && !is_space(s[j])) {  // punctuation run
    while (j < n && !is_space(s[j]) && !is_letter(s[j]) && !is_digit(s[j]))
      ++j;
    return j;
  }
  if (leading_space) return i + 1;  // lone space before whitespace
  while (j < n && is_space(s[j])) ++j;  // whitespace run
  return j;
}

// Merge loop over one pre-token (ids mutated in place).
void merge_ids(const Bpe& bpe, std::vector<int32_t>& ids) {
  while (ids.size() >= 2) {
    uint32_t best_rank = UINT32_MAX;
    size_t best_i = 0;
    int32_t best_merged = -1;
    for (size_t i = 0; i + 1 < ids.size(); ++i) {
      auto it = bpe.ranks.find(pair_key(ids[i], ids[i + 1]));
      if (it != bpe.ranks.end()) {
        uint32_t rank = uint32_t(it->second >> 32);
        if (rank < best_rank) {
          best_rank = rank;
          best_i = i;
          best_merged = int32_t(uint32_t(it->second));
        }
      }
    }
    if (best_merged < 0) break;
    ids[best_i] = best_merged;
    ids.erase(ids.begin() + best_i + 1);
  }
}

}  // namespace

extern "C" {

// vocab_blob: vocab_size entries of u32 little-endian length + raw bytes.
// merges: n_merges triples (left_id, right_id, merged_id) in rank order.
void* mila_bpe_new(const uint8_t* vocab_blob, int64_t blob_len,
                   int32_t vocab_size, const int32_t* merges,
                   int64_t n_merges) {
  Bpe* bpe = new Bpe();
  bpe->vocab.reserve(size_t(vocab_size));
  int64_t off = 0;
  for (int32_t i = 0; i < vocab_size; ++i) {
    if (off + 4 > blob_len) {
      delete bpe;
      return nullptr;
    }
    uint32_t len;
    std::memcpy(&len, vocab_blob + off, 4);
    off += 4;
    if (off + int64_t(len) > blob_len) {
      delete bpe;
      return nullptr;
    }
    bpe->vocab.emplace_back(reinterpret_cast<const char*>(vocab_blob + off),
                            size_t(len));
    off += len;
  }
  for (int32_t i = 0; i < vocab_size; ++i) bpe->lookup[bpe->vocab[i]] = i;
  for (int b = 0; b < 256; ++b) {
    std::string one(1, char(b));
    auto it = bpe->lookup.find(one);
    bpe->byte_to_id[b] = it == bpe->lookup.end() ? -1 : it->second;
  }
  for (int64_t r = 0; r < n_merges; ++r) {
    int32_t a = merges[r * 3], b = merges[r * 3 + 1], m = merges[r * 3 + 2];
    bpe->ranks.emplace(pair_key(a, b),
                       (uint64_t(uint32_t(r)) << 32) | uint32_t(m));
  }
  return bpe;
}

void mila_bpe_free(void* h) { delete static_cast<Bpe*>(h); }

// Returns token count (-1: error / unknown byte / out too small).
int64_t mila_bpe_encode(void* h, const uint8_t* text, int64_t text_len,
                        int32_t* out, int64_t cap) {
  const Bpe& bpe = *static_cast<Bpe*>(h);
  int64_t n_out = 0;
  std::vector<int32_t> ids;
  size_t i = 0;
  const size_t n = size_t(text_len);
  while (i < n) {
    size_t j = next_pretoken(text, n, i);
    if (j <= i) return -1;
    ids.clear();
    for (size_t k = i; k < j; ++k) {
      int32_t id = bpe.byte_to_id[text[k]];
      if (id < 0) return -1;
      ids.push_back(id);
    }
    merge_ids(bpe, ids);
    if (n_out + int64_t(ids.size()) > cap) return -1;
    for (int32_t id : ids) out[n_out++] = id;
    i = j;
  }
  return n_out;
}

int mila_bpe_version() { return 1; }

}  // extern "C"
