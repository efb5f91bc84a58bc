// Native word-vocabulary batch encoder.
//
// The reference consumes SentencePiece (C++ via pip wheel) for tokenizer
// training + encode/decode (reference tokenizer.py:29,418-430).  For the
// word-model family this framework uses, encoding reduces to whitespace
// splitting + vocab lookup + BOS/EOS + truncation; this library does that
// for whole caption batches in one call (the per-step host path that feeds
// the device batcher).
//
// C ABI (ctypes):
//   void*  tok_new(void)
//   void   tok_free(void*)
//   void   tok_load_vocab(void*, const char* blob, const int64_t* offsets,
//                         int64_t n)            // word i = blob[off[i], off[i+1])
//   void   tok_encode_batch(void*, const char* blob, const int64_t* offsets,
//                           int64_t n, int32_t bos, int32_t eos,
//                           int32_t unk, int32_t pad, int32_t max_len,
//                           int32_t* out /* n*max_len */)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
};

}  // namespace

extern "C" {

void* tok_new() { return new Vocab(); }
void tok_free(void* h) { delete static_cast<Vocab*>(h); }

void tok_load_vocab(void* h, const char* blob, const int64_t* offsets, int64_t n) {
  auto* v = static_cast<Vocab*>(h);
  v->map.clear();
  v->map.reserve(static_cast<size_t>(n) * 2);
  for (int64_t i = 0; i < n; ++i) {
    v->map.emplace(std::string(blob + offsets[i], blob + offsets[i + 1]), static_cast<int32_t>(i));
  }
}

void tok_encode_batch(void* h, const char* blob, const int64_t* offsets, int64_t n,
                      int32_t bos, int32_t eos, int32_t unk, int32_t pad,
                      int32_t max_len, int32_t* out) {
  auto* v = static_cast<Vocab*>(h);
  for (int64_t i = 0; i < n; ++i) {
    const char* p = blob + offsets[i];
    const char* end = blob + offsets[i + 1];
    int32_t* row = out + i * max_len;
    for (int32_t j = 0; j < max_len; ++j) row[j] = pad;
    int32_t pos = 0;
    if (pos < max_len) row[pos++] = bos;
    while (p < end && pos < max_len) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\n')) ++p;
      const char* start = p;
      while (p < end && *p != ' ' && *p != '\t' && *p != '\n') ++p;
      if (p == start) break;
      auto it = v->map.find(std::string(start, p));
      row[pos++] = it == v->map.end() ? unk : it->second;
    }
    if (pos < max_len) row[pos] = eos;
    // truncation drops EOS, matching the reference's ids[:max_seq_length]
  }
}

}  // extern "C"
