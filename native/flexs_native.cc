// flexs_native: host-side native scorers for the flexs_tpu oracles.
//
// The reference's ground-truth oracles are native libraries (ViennaRNA's C
// duplexfold, PyRosetta's C++ centroid scorer — SURVEY.md §2.4).  The TPU
// compute path re-implements both as JAX device programs
// (flexs_tpu/ops/rna_duplex.py, flexs_tpu/landscapes/rosetta.py); this
// library provides the matching native host path — same tables, same
// features, same recursions — for embedding, serving without a TPU, and
// cross-checking the device kernels (tests/test_native.py asserts
// agreement).
//
// Exposed via a plain C ABI (ctypes-friendly; no pybind11 dependency).
//
// Build: scripts/build_native.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Rosetta-style centroid scorer.
//
// energy(s) = sum_i env_site[i][s_i] + sum_p pair_site[p][s_i(p)][s_j(p)]
// fitness   = sigmoid((-energy - center) / norm)
//
// Mirrors flexs_tpu/landscapes/rosetta.py::_rosetta_fitness exactly.
// ---------------------------------------------------------------------------
void rosetta_score_batch(const float* env_site,   // [length * 20]
                         const float* pair_site,  // [n_pairs * 400]
                         const int32_t* pair_i,   // [n_pairs]
                         const int32_t* pair_j,   // [n_pairs]
                         int32_t n_pairs, int32_t length,
                         const int32_t* tokens,  // [batch * length]
                         int32_t batch, float center, float norm,
                         float* out /* [batch] */) {
  for (int32_t b = 0; b < batch; ++b) {
    const int32_t* seq = tokens + b * length;
    double energy = 0.0;
    for (int32_t i = 0; i < length; ++i) {
      energy += env_site[i * 20 + seq[i]];
    }
    for (int32_t p = 0; p < n_pairs; ++p) {
      const int32_t ai = seq[pair_i[p]];
      const int32_t aj = seq[pair_j[p]];
      energy += pair_site[p * 400 + ai * 20 + aj];
    }
    const double z = (-energy - center) / norm;
    out[b] = static_cast<float>(1.0 / (1.0 + std::exp(-z)));
  }
}

// ---------------------------------------------------------------------------
// RNA duplex hybridization energy.
//
// Same DP as flexs_tpu/ops/rna_duplex.py::_duplex_dp: c[i][j] = best
// energy of a duplex where sequence position i pairs (reversed-)target
// position j, extended by stack / bulge / interior moves bounded by the
// loop-cost window.
// ---------------------------------------------------------------------------
static const float kInf = 1e6f;

void rna_duplex_energy_batch(
    const int32_t* seqs,        // [batch * l1] tokens (UGCA order)
    int32_t batch, int32_t l1,
    const int32_t* target_rev,  // [l2] reversed target tokens
    int32_t l2,
    const float* stack,         // [7 * 7]
    const float* loop_cost,     // [d * d], d = maxloop + 2
    int32_t maxloop, float duplex_init, float terminal_au, float end_bonus,
    float* out /* [batch] */) {
  const int32_t d = maxloop + 2;

  // Pair-type table in UGCA token order (matches rna_duplex.PAIR_TABLE).
  int32_t pair_tbl[4][4] = {};
  pair_tbl[2][1] = 1;  // CG
  pair_tbl[1][2] = 2;  // GC
  pair_tbl[1][0] = 3;  // GU
  pair_tbl[0][1] = 4;  // UG
  pair_tbl[3][0] = 5;  // AU
  pair_tbl[0][3] = 6;  // UA
  const float weak[7] = {0, 0, 0, 1, 1, 1, 1};

  std::vector<float> dp(static_cast<size_t>(d) * l2);

  for (int32_t b = 0; b < batch; ++b) {
    const int32_t* s = seqs + b * l1;
    std::fill(dp.begin(), dp.end(), kInf);
    float best = kInf;
    // dp is a rolling window: row (i % d) holds c[i][*].
    for (int32_t i = 0; i < l1; ++i) {
      float* row = dp.data() + static_cast<size_t>(i % d) * l2;
      for (int32_t j = 0; j < l2; ++j) {
        const int32_t pt = pair_tbl[s[i]][target_rev[j]];
        if (pt == 0) {
          row[j] = kInf;
          continue;
        }
        float e = duplex_init + terminal_au * weak[pt];
        // Stack extension from (i-1, j-1).
        if (i >= 1 && j >= 1) {
          const int32_t ptp = pair_tbl[s[i - 1]][target_rev[j - 1]];
          const float prev = dp[static_cast<size_t>((i - 1) % d) * l2 + j - 1];
          if (prev < kInf / 2 && ptp > 0) {
            e = std::min(e, prev + stack[ptp * 7 + pt]);
          }
        }
        // Bulge / interior extensions.
        const int32_t di_max = std::min(i, d - 1);
        for (int32_t di = 1; di <= di_max; ++di) {
          const float* prow = dp.data() + static_cast<size_t>((i - di) % d) * l2;
          const int32_t dj_max = std::min(j, d - 1);
          for (int32_t dj = 1; dj <= dj_max; ++dj) {
            const float cost = loop_cost[di * d + dj];
            if (cost >= kInf / 2) continue;
            const float prev = prow[j - dj];
            if (prev < kInf / 2) e = std::min(e, prev + cost);
          }
        }
        row[j] = e;
        const float close = e + terminal_au * weak[pt] + end_bonus;
        best = std::min(best, close);
      }
    }
    out[b] = best >= kInf / 2 ? 0.0f : best;
  }
}

}  // extern "C"
