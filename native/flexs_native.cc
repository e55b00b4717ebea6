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
// Same DP and energy model as flexs_tpu/ops/rna_duplex.py::_duplex_dp:
// c[i][j] = best energy of a duplex where sequence position i pairs
// (reversed-)target position j, extended by a helix stack, a 1-bulge
// (stack-through), a 1x1 interior loop (joint table), a generic interior
// loop (size + Ninio + per-side mismatch tables), or a longer bulge
// (size + terminal AU on both closing pairs), with sequence-dependent
// end terms at both duplex ends.
// ---------------------------------------------------------------------------
static const float kInf = 1e6f;

void rna_duplex_energy_batch(
    const int32_t* seqs,        // [batch * l1] tokens (UGCA order)
    int32_t batch, int32_t l1,
    const int32_t* target_rev,  // [l2] reversed target tokens
    int32_t l2,
    const float* stack,          // [7 * 7]
    const float* mA,             // [7 * 4 * 4] opening-pair interior mismatch
    const float* mB,             // [7 * 4 * 4] closing-pair interior mismatch
    const float* int11,          // [7 * 7 * 4 * 4] joint 1x1 table
    const float* ext5,           // [7 * 5 * 5] duplex-start end term
    const float* ext3,           // [7 * 5 * 5] duplex-close end term
    const float* interior_cost,  // [d * d], d = maxloop + 2 (generic sizes)
    const float* bulge_sizes,    // [maxloop + 1] by bulge length
    int32_t maxloop, float duplex_init, float terminal_au,
    float* out /* [batch] */) {
  const int32_t d = maxloop + 2;
  const int32_t kNone = 4;  // "no neighboring base" index in ext tables

  // Pair-type table in UGCA token order (matches rna_duplex.PAIR_TABLE).
  int32_t pair_tbl[4][4] = {};
  pair_tbl[2][1] = 1;  // CG
  pair_tbl[1][2] = 2;  // GC
  pair_tbl[1][0] = 3;  // GU
  pair_tbl[0][1] = 4;  // UG
  pair_tbl[3][0] = 5;  // AU
  pair_tbl[0][3] = 6;  // UA
  const float weak[7] = {0, 0, 0, 1, 1, 1, 1};
  const float bulge1 = bulge_sizes[1];

  std::vector<float> dp(static_cast<size_t>(d) * l2);
  const int32_t* t = target_rev;

  for (int32_t b = 0; b < batch; ++b) {
    const int32_t* s = seqs + b * l1;
    std::fill(dp.begin(), dp.end(), kInf);
    float best = kInf;
    // dp is a rolling window: row (i % d) holds c[i][*].
    for (int32_t i = 0; i < l1; ++i) {
      float* row = dp.data() + static_cast<size_t>(i % d) * l2;
      for (int32_t j = 0; j < l2; ++j) {
        const int32_t pt = pair_tbl[s[i]][t[j]];
        if (pt == 0) {
          row[j] = kInf;
          continue;
        }
        // Open a new duplex at (i, j).
        const int32_t b5 = i > 0 ? s[i - 1] : kNone;
        const int32_t b3 = j > 0 ? t[j - 1] : kNone;
        float e = duplex_init + ext5[(pt * 5 + b5) * 5 + b3];

        const float mb =
            (i >= 1 && j >= 1) ? mB[(pt * 4 + s[i - 1]) * 4 + t[j - 1]] : 0.0f;
        const float au = terminal_au * weak[pt];

        // Helix stack from (i-1, j-1).
        if (i >= 1 && j >= 1) {
          const int32_t ptp = pair_tbl[s[i - 1]][t[j - 1]];
          const float prev = dp[static_cast<size_t>((i - 1) % d) * l2 + j - 1];
          if (prev < kInf / 2) e = std::min(e, prev + stack[ptp * 7 + pt]);
        }
        // 1-bulges: stack-through across the bulge + size-1 cost.
        if (i >= 2 && j >= 1) {
          const int32_t ptp = pair_tbl[s[i - 2]][t[j - 1]];
          const float prev = dp[static_cast<size_t>((i - 2) % d) * l2 + j - 1];
          if (prev < kInf / 2) e = std::min(e, prev + bulge1 + stack[ptp * 7 + pt]);
        }
        if (i >= 1 && j >= 2) {
          const int32_t ptp = pair_tbl[s[i - 1]][t[j - 2]];
          const float prev = dp[static_cast<size_t>((i - 1) % d) * l2 + j - 2];
          if (prev < kInf / 2) e = std::min(e, prev + bulge1 + stack[ptp * 7 + pt]);
        }
        // 1x1 interior loop: joint table.
        if (i >= 2 && j >= 2) {
          const int32_t ptp = pair_tbl[s[i - 2]][t[j - 2]];
          const float prev = dp[static_cast<size_t>((i - 2) % d) * l2 + j - 2];
          if (prev < kInf / 2) {
            e = std::min(
                e, prev + int11[((ptp * 7 + pt) * 4 + s[i - 1]) * 4 + t[j - 1]]);
          }
        }
        // Generic interior loops.
        const int32_t di_max = std::min(i, d - 1);
        const int32_t dj_max = std::min(j, d - 1);
        for (int32_t di = 2; di <= di_max; ++di) {
          const float* prow = dp.data() + static_cast<size_t>((i - di) % d) * l2;
          for (int32_t dj = 2; dj <= dj_max; ++dj) {
            const float cost = interior_cost[di * d + dj];
            if (cost >= kInf / 2) continue;  // 1x1 or too large
            const float prev = prow[j - dj];
            if (prev >= kInf / 2) continue;
            const int32_t ptp = pair_tbl[s[i - di]][t[j - dj]];
            const float ma = mA[(ptp * 4 + s[i - di + 1]) * 4 + t[j - dj + 1]];
            e = std::min(e, prev + cost + ma + mb);
          }
        }
        // Bulges of >= 2 unpaired bases: terminal AU on both pairs.
        for (int32_t di = 3; di <= di_max && di - 1 <= maxloop; ++di) {
          if (j < 1) break;
          const float prev = dp[static_cast<size_t>((i - di) % d) * l2 + j - 1];
          if (prev >= kInf / 2) continue;
          const int32_t ptp = pair_tbl[s[i - di]][t[j - 1]];
          e = std::min(e,
                       prev + bulge_sizes[di - 1] + terminal_au * weak[ptp] + au);
        }
        if (i >= 1) {
          const float* prow = dp.data() + static_cast<size_t>((i - 1) % d) * l2;
          for (int32_t dj = 3; dj <= dj_max && dj - 1 <= maxloop; ++dj) {
            const float prev = prow[j - dj];
            if (prev >= kInf / 2) continue;
            const int32_t ptp = pair_tbl[s[i - 1]][t[j - dj]];
            e = std::min(
                e, prev + bulge_sizes[dj - 1] + terminal_au * weak[ptp] + au);
          }
        }
        row[j] = e;
        // Close the duplex at (i, j).
        const int32_t a3 = i < l1 - 1 ? s[i + 1] : kNone;
        const int32_t a5 = j < l2 - 1 ? t[j + 1] : kNone;
        best = std::min(best, e + ext3[(pt * 5 + a3) * 5 + a5]);
      }
    }
    out[b] = best >= kInf / 2 ? 0.0f : best;
  }
}

}  // extern "C"
