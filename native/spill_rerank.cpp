// Native fused rerank for the host-spilled episodic bank.
//
// C++ counterpart of SpilledBank._host_rerank's no-locations fast path
// (aura_snn_rag_tpu/memory/host_spill.py): given the device funnel's
// [B, F] candidate slot ids, score each candidate against its query in
// f32 (cosine from raw rows x precomputed inverse norms, plus the
// temporal*strength term recomputed from the host metadata mirrors) and
// keep the top k per query.
//
// Why native: the numpy path materializes the [B, F, D] candidate gather
// (604 MB at B=1024, F=192, D=768) and then reads it again through BLAS —
// ~1.2 GB of memory traffic plus a fancy-indexing pass, all on the
// serving path's single host core. This kernel streams each candidate row
// exactly once (3 KB) directly into a dot-product accumulator: no
// intermediate, roughly half the traffic, no allocator churn. The host
// rerank is the serial stage that bounds the 10M-row tier's QPS
// (docs/BENCHMARKS.md breakdown), so its constant factor is the product.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Portable
// baseline ISA (no -march=native): the dot loop auto-vectorizes on any
// x86-64; the kernel is memory-bound on the row stream regardless.

#include <cmath>
#include <cstdint>

namespace {

constexpr float kNegInf = -1e30f;

inline float dot(const float* a, const float* b, int64_t d) {
  // four scalar accumulators: enough ILP for the compiler to vectorize
  // and unroll without -ffast-math (which could reorder vs numpy)
  float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
  int64_t i = 0;
  for (; i + 4 <= d; i += 4) {
    s0 += a[i] * b[i];
    s1 += a[i + 1] * b[i + 1];
    s2 += a[i + 2] * b[i + 2];
    s3 += a[i + 3] * b[i + 3];
  }
  for (; i < d; ++i) s0 += a[i] * b[i];
  return (s0 + s1) + (s2 + s3);
}

}  // namespace

extern "C" {

// Rerank the funnel candidates of B queries; write top-k slots/scores.
//
// bank:      [M, D] raw f32 rows (the host-resident exact store)
// inv_norm:  [M] precomputed 1/||row||
// strength:  [M] host mirror of the decayable strength
// timestamp: [M] host mirror of the logical write step
// slots:     [B, F] signed candidate slot ids from the device funnel
//            (-1 = dead lane)
// qn:        [B, D] L2-normalized queries (f32)
// out_slots: [B, k] winning slots, -1 where fewer than k live candidates
// out_scores:[B, k] their combined scores (0.0 where slot is -1)
//
// Score math mirrors _host_rerank exactly: combined =
//   w_cosine*strength*cos + w_temporal*exp(-max(age,0)/tau)*strength,
// age = (step - timestamp) * seconds_per_step, cos = dot(row, qn)*inv_norm.
void aura_spill_rerank(const float* bank, const float* inv_norm,
                       const float* strength, const float* timestamp,
                       const int32_t* slots, const float* qn,
                       float step, float seconds_per_step,
                       float temporal_tau, float w_cosine, float w_temporal,
                       int64_t B, int64_t F, int64_t D, int64_t k,
                       int64_t* out_slots, float* out_scores) {
  if (k > F) k = F;
  for (int64_t b = 0; b < B; ++b) {
    const float* q = qn + b * D;
    const int32_t* cand = slots + b * F;
    int64_t* os = out_slots + b * k;
    float* ov = out_scores + b * k;
    // top-k by insertion (k ~ 10): ov descending, early-out on ov[k-1]
    int64_t filled = 0;
    for (int64_t i = 0; i < k; ++i) {
      os[i] = -1;
      ov[i] = kNegInf;
    }
    for (int64_t f = 0; f < F; ++f) {
      const int32_t s = cand[f];
      if (s < 0) continue;
      const float st = strength[s];
      float age = (step - timestamp[s]) * seconds_per_step;
      if (age < 0.f) age = 0.f;
      const float cos = dot(bank + static_cast<int64_t>(s) * D, q, D)
                        * inv_norm[s];
      const float score = w_cosine * st * cos
                          + w_temporal * std::exp(-age / temporal_tau) * st;
      if (score <= ov[k - 1]) continue;
      // insert, shifting down (stable for distinct scores; ties keep the
      // earlier-seen candidate above, like a stable sort would)
      int64_t pos = (filled < k) ? filled++ : k - 1;
      while (pos > 0 && ov[pos - 1] < score) {
        ov[pos] = ov[pos - 1];
        os[pos] = os[pos - 1];
        --pos;
      }
      ov[pos] = score;
      os[pos] = s;
    }
    for (int64_t i = 0; i < k; ++i) {
      if (os[i] < 0) ov[i] = 0.0f;  // miss lanes: score 0, slot -1
    }
  }
}

}  // extern "C"
