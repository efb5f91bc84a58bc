// Native SCST reward scorer: CIDEr-D (+ optional BLEU-1..4) over interned
// token-id sequences.
//
// This is the TPU-native framework's replacement for the reference's
// host-side reward path (vendored numpy CIDEr-D at
// scst/cider/pyciderevalcap/ciderD/ciderD_scorer.py:57-226 and the
// pycocoevalcap BLEU scorer) — the per-step host bottleneck of SCST
// training.  Python interns caption tokens to int32 ids and ships flat
// arrays; all n-gram hashing and tf-idf math happens here.
//
// Semantics mirror the reference exactly (count clipping, gaussian length
// penalty with "length" = bigram count, idf = ref_len - log(max(1, df)),
// per-image mean over n-gram orders / refs, x10).
//
// C ABI (ctypes): see reward.h-style declarations at the bottom.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kN = 4;

struct NgramKey {
  int32_t w[kN];
  int8_t len;
  bool operator==(const NgramKey& o) const {
    return len == o.len && std::memcmp(w, o.w, sizeof(w)) == 0;
  }
};

struct NgramHash {
  size_t operator()(const NgramKey& k) const {
    // FNV-1a over the used words + length
    uint64_t h = 1469598103934665603ULL;
    for (int i = 0; i < k.len; ++i) {
      h ^= static_cast<uint64_t>(static_cast<uint32_t>(k.w[i]));
      h *= 1099511628211ULL;
    }
    h ^= static_cast<uint64_t>(k.len);
    h *= 1099511628211ULL;
    return static_cast<size_t>(h);
  }
};

using NgramCounts = std::unordered_map<NgramKey, double, NgramHash>;

void count_ngrams(const int32_t* ids, int len, NgramCounts* out) {
  for (int n = 1; n <= kN; ++n) {
    for (int i = 0; i + n <= len; ++i) {
      NgramKey key{};
      key.len = static_cast<int8_t>(n);
      for (int j = 0; j < n; ++j) key.w[j] = ids[i + j];
      (*out)[key] += 1.0;
    }
  }
}

struct TfIdfVec {
  NgramCounts weights;          // ngram -> tf * idf
  double norm[kN] = {0, 0, 0, 0};
  int length = 0;               // reference quirk: bigram count
};

struct Scorer {
  double sigma = 6.0;
  double ref_len = 0.0;  // log(#corpus images)
  NgramCounts df;

  void counts_to_vec(const NgramCounts& counts, TfIdfVec* out) const {
    for (const auto& kv : counts) {
      auto it = df.find(kv.first);
      double d = it == df.end() ? 0.0 : it->second;
      double idf = ref_len - std::log(d > 1.0 ? d : 1.0);
      int n = kv.first.len - 1;
      double w = kv.second * idf;
      out->weights[kv.first] = w;
      out->norm[n] += w * w;
      if (n == 1) out->length += static_cast<int>(kv.second);
    }
    for (int n = 0; n < kN; ++n) out->norm[n] = std::sqrt(out->norm[n]);
  }

  void sim(const TfIdfVec& hyp, const TfIdfVec& ref, double* val) const {
    double acc[kN] = {0, 0, 0, 0};
    for (const auto& kv : hyp.weights) {
      auto it = ref.weights.find(kv.first);
      if (it == ref.weights.end()) continue;
      int n = kv.first.len - 1;
      double clipped = kv.second < it->second ? kv.second : it->second;
      acc[n] += clipped * it->second;
    }
    double delta = static_cast<double>(hyp.length - ref.length);
    double penalty = std::exp(-(delta * delta) / (2.0 * sigma * sigma));
    for (int n = 0; n < kN; ++n) {
      double v = acc[n];
      if (hyp.norm[n] != 0.0 && ref.norm[n] != 0.0) v /= hyp.norm[n] * ref.norm[n];
      val[n] = v * penalty;
    }
  }
};

// ------------------------------------------------------------- BLEU
struct BleuStats {
  // clipped correct + guess per order, test len, closest ref len
  double correct[kN] = {0, 0, 0, 0};
  double guess[kN] = {0, 0, 0, 0};
  int testlen = 0;
  int reflen = 0;
};

void bleu_segment(const int32_t* hyp, int hyp_len, const int32_t* const* refs,
                  const int* ref_lens, int num_refs, BleuStats* st) {
  NgramCounts hyp_counts;
  count_ngrams(hyp, hyp_len, &hyp_counts);
  NgramCounts max_ref;
  int best_ref_len = 0;
  int best_diff = 1 << 30;
  for (int r = 0; r < num_refs; ++r) {
    NgramCounts rc;
    count_ngrams(refs[r], ref_lens[r], &rc);
    for (const auto& kv : rc) {
      double& cur = max_ref[kv.first];
      if (kv.second > cur) cur = kv.second;
    }
    int diff = std::abs(ref_lens[r] - hyp_len);
    if (diff < best_diff || (diff == best_diff && ref_lens[r] < best_ref_len)) {
      best_diff = diff;
      best_ref_len = ref_lens[r];
    }
  }
  st->testlen = hyp_len;
  st->reflen = best_ref_len;
  for (int n = 0; n < kN; ++n) st->guess[n] = hyp_len - n > 0 ? hyp_len - n : 0;
  for (const auto& kv : hyp_counts) {
    auto it = max_ref.find(kv.first);
    if (it == max_ref.end()) continue;
    st->correct[kv.first.len - 1] += kv.second < it->second ? kv.second : it->second;
  }
}

double tiny = 1e-15, small_ = 1e-9;

}  // namespace

extern "C" {

void* reward_scorer_new(double sigma, double ref_len) {
  auto* s = new Scorer();
  s->sigma = sigma;
  s->ref_len = ref_len;
  return s;
}

void reward_scorer_free(void* handle) { delete static_cast<Scorer*>(handle); }

// df ngrams: flat ids + per-ngram lengths + df values.
// Returns the number of REJECTED entries (len outside [1, kN]) so the
// Python side can fail loudly — writing lens[i] > kN words would
// overflow NgramKey::w (a df pickle built with n > 4 must error, as the
// pure-Python path does).
int64_t reward_scorer_set_df(void* handle, const int32_t* flat_ids, const int8_t* lens,
                             const double* values, int64_t count) {
  auto* s = static_cast<Scorer*>(handle);
  s->df.clear();
  s->df.reserve(static_cast<size_t>(count) * 2);
  int64_t off = 0;
  int64_t rejected = 0;
  for (int64_t i = 0; i < count; ++i) {
    if (lens[i] < 1 || lens[i] > kN) {
      off += lens[i];
      ++rejected;
      continue;
    }
    NgramKey key{};
    key.len = lens[i];
    for (int j = 0; j < lens[i]; ++j) key.w[j] = flat_ids[off + j];
    off += lens[i];
    s->df[key] = values[i];
  }
  return rejected;
}

// Score `num_items` hypotheses, each against its reference group.
//   hyp_flat/hyp_offsets: concatenated hyp token ids, offsets length num_items+1
//   ref_flat/ref_offsets: concatenated ref ids, offsets length total_refs+1
//   item_ref_offsets: per item, adjacent (start, end) pairs into the ref
//     list (length 2*num_items) — items may share reference groups
//   cider_weight, bleu_weights[4]
//   out: per-item combined reward
void reward_score_batch(void* handle, const int32_t* hyp_flat, const int64_t* hyp_offsets,
                        const int32_t* ref_flat, const int64_t* ref_offsets,
                        const int64_t* item_ref_offsets, int64_t num_items,
                        double cider_weight, const double* bleu_weights, double* out) {
  auto* s = static_cast<Scorer*>(handle);
  bool use_bleu = false;
  for (int n = 0; n < kN; ++n) use_bleu |= bleu_weights[n] > 0.0;

  // cache per-ref tf-idf vectors (refs repeat across samples of one image)
  int64_t total_refs = 0;
  for (int64_t i = 0; i < num_items; ++i)
    if (item_ref_offsets[2 * i + 1] > total_refs) total_refs = item_ref_offsets[2 * i + 1];
  std::vector<TfIdfVec> ref_vecs;
  if (cider_weight > 0.0) {
    ref_vecs.resize(static_cast<size_t>(total_refs));
    for (int64_t r = 0; r < total_refs; ++r) {
      NgramCounts rc;
      count_ngrams(ref_flat + ref_offsets[r], static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]), &rc);
      s->counts_to_vec(rc, &ref_vecs[static_cast<size_t>(r)]);
    }
  }

  for (int64_t i = 0; i < num_items; ++i) {
    const int32_t* hyp = hyp_flat + hyp_offsets[i];
    int hyp_len = static_cast<int>(hyp_offsets[i + 1] - hyp_offsets[i]);
    int64_t r0 = item_ref_offsets[2 * i], r1 = item_ref_offsets[2 * i + 1];
    double total = 0.0;

    if (cider_weight > 0.0) {
      NgramCounts hc;
      count_ngrams(hyp, hyp_len, &hc);
      TfIdfVec hv;
      s->counts_to_vec(hc, &hv);
      double score[kN];
      double acc = 0.0;
      for (int64_t r = r0; r < r1; ++r) {
        s->sim(hv, ref_vecs[static_cast<size_t>(r)], score);
        for (int n = 0; n < kN; ++n) acc += score[n];
      }
      double n_refs = static_cast<double>(r1 - r0);
      total += cider_weight * (acc / kN / n_refs * 10.0);
    }

    if (use_bleu) {
      std::vector<const int32_t*> refs;
      std::vector<int> ref_lens;
      for (int64_t r = r0; r < r1; ++r) {
        refs.push_back(ref_flat + ref_offsets[r]);
        ref_lens.push_back(static_cast<int>(ref_offsets[r + 1] - ref_offsets[r]));
      }
      BleuStats st;
      bleu_segment(hyp, hyp_len, refs.data(), ref_lens.data(), static_cast<int>(refs.size()), &st);
      double bleu = 1.0;
      double per_order[kN];
      for (int n = 0; n < kN; ++n) {
        bleu *= (st.correct[n] + tiny) / (st.guess[n] + small_);
        per_order[n] = std::pow(bleu, 1.0 / (n + 1));
      }
      double ratio = (st.testlen + tiny) / (st.reflen + small_);
      if (ratio < 1.0) {
        for (int n = 0; n < kN; ++n) per_order[n] *= std::exp(1.0 - 1.0 / ratio);
      }
      for (int n = 0; n < kN; ++n) total += bleu_weights[n] * per_order[n];
    }
    out[i] = total;
  }
}

}  // extern "C"
