// Native glocal-DP aligner: the host-side exact engine.
//
// Implements the same contract as calitas_tpu.align.oracle (glocal DP with
// per-end-column multi-hit traceback, linear gap costs, diag > left > up
// traceback preference) at ~100x NumPy speed.  Used to finish the sparse
// candidate windows flagged by the device screen, and as an independent
// oracle for kernel tests.
//
// Build: g++ -O3 -march=native -shared -fPIC aligner.cpp -o libcalitas.so
// ABI: plain C, driven from Python via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Fill the final DP row: out_final[j] = S[Q][j] for j in 0..T.
// Returns the max over j in 1..T.
int32_t dp_final_row(const uint8_t* qmask, int32_t Q,
                     const uint8_t* tmask, int32_t T,
                     int32_t match, int32_t mismatch,
                     int32_t qgap, int32_t tgap,
                     int32_t* out_final) {
  std::vector<int32_t> prev(T + 1), cur(T + 1);
  for (int32_t j = 0; j <= T; ++j) prev[j] = 0;
  for (int32_t i = 1; i <= Q; ++i) {
    const uint8_t q = qmask[i - 1];
    cur[0] = prev[0] + tgap;
    for (int32_t j = 1; j <= T; ++j) {
      const int32_t pair = (q & tmask[j - 1]) ? match : mismatch;
      int32_t best = prev[j - 1] + pair;
      const int32_t up = prev[j] + tgap;
      if (up > best) best = up;
      const int32_t left = cur[j - 1] + qgap;
      if (left > best) best = left;
      cur[j] = best;
    }
    std::swap(prev, cur);
  }
  int32_t best = INT32_MIN;
  for (int32_t j = 0; j <= T; ++j) {
    out_final[j] = prev[j];
    if (j >= 1 && prev[j] > best) best = prev[j];
  }
  return best;
}

// Multi-end alignment: one alignment per end column j (1..T) with
// S[Q][j] >= min_score, ascending j.  For each hit, writes:
//   out_scores[k], out_ends[k] (1-based inclusive), out_starts[k]
//   (1-based), and the cigar as ops into out_ops (one char per aligned
//   column: '=', 'X', 'I', 'D'), with out_ops_len[k] giving its length and
//   ops packed back-to-back starting at out_ops_off[k].
// Returns the number of hits (capped at max_hits; negative = error).
int32_t dp_align_multi(const uint8_t* qmask, int32_t Q,
                       const uint8_t* tmask, int32_t T,
                       int32_t match, int32_t mismatch,
                       int32_t qgap, int32_t tgap,
                       int32_t min_score, int32_t max_hits,
                       int32_t* out_scores, int32_t* out_ends,
                       int32_t* out_starts,
                       char* out_ops, int32_t out_ops_cap,
                       int32_t* out_ops_off, int32_t* out_ops_len) {
  if (Q <= 0 || T <= 0) return 0;
  // Full matrix, row-major (Q+1) x (T+1).
  std::vector<int32_t> S((size_t)(Q + 1) * (T + 1));
  for (int32_t j = 0; j <= T; ++j) S[j] = 0;
  for (int32_t i = 1; i <= Q; ++i) {
    int32_t* row = &S[(size_t)i * (T + 1)];
    const int32_t* prow = &S[(size_t)(i - 1) * (T + 1)];
    const uint8_t q = qmask[i - 1];
    row[0] = prow[0] + tgap;
    for (int32_t j = 1; j <= T; ++j) {
      const int32_t pair = (q & tmask[j - 1]) ? match : mismatch;
      int32_t best = prow[j - 1] + pair;
      const int32_t up = prow[j] + tgap;
      if (up > best) best = up;
      const int32_t left = row[j - 1] + qgap;
      if (left > best) best = left;
      row[j] = best;
    }
  }

  const int32_t* frow = &S[(size_t)Q * (T + 1)];
  int32_t n = 0;
  int32_t ops_pos = 0;
  std::vector<char> rev_ops;
  rev_ops.reserve(Q + 64);
  for (int32_t end = 1; end <= T; ++end) {
    if (frow[end] < min_score) continue;
    if (n >= max_hits) return -1;  // caller should retry with more space
    // Traceback from (Q, end); preference diag > left(D) > up(I).
    rev_ops.clear();
    int32_t i = Q, j = end;
    while (i > 0) {
      const int32_t s = S[(size_t)i * (T + 1) + j];
      bool moved = false;
      if (j > 0) {
        const bool compat = (qmask[i - 1] & tmask[j - 1]) != 0;
        const int32_t pair = compat ? match : mismatch;
        if (s == S[(size_t)(i - 1) * (T + 1) + (j - 1)] + pair) {
          rev_ops.push_back(compat ? '=' : 'X');
          --i; --j; moved = true;
        } else if (s == S[(size_t)i * (T + 1) + (j - 1)] + qgap) {
          rev_ops.push_back('D');
          --j; moved = true;
        }
      }
      if (!moved) {
        if (s == S[(size_t)(i - 1) * (T + 1) + j] + tgap) {
          rev_ops.push_back('I');
          --i;
        } else {
          return -2;  // traceback inconsistency (should be impossible)
        }
      }
    }
    const int32_t len = (int32_t)rev_ops.size();
    if (ops_pos + len > out_ops_cap) return -1;
    out_scores[n] = frow[end];
    out_ends[n] = end;
    out_starts[n] = j + 1;
    out_ops_off[n] = ops_pos;
    out_ops_len[n] = len;
    for (int32_t k = 0; k < len; ++k) out_ops[ops_pos + k] = rev_ops[len - 1 - k];
    ops_pos += len;
    ++n;
  }
  return n;
}

}  // extern "C"
