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


namespace {

// Two-pass row fill: pass 1 (auto-vectorizable) computes
// max(diag + pair, up + tgap); pass 2 closes over the left-gap chain.
// Identical results to the fused 3-way max.
inline void fill_row(const int32_t* prev, int32_t* row, int32_t* tmp,
                     const uint8_t* tmask, int32_t T, uint8_t q,
                     int32_t match, int32_t mismatch,
                     int32_t qgap, int32_t tgap) {
  for (int32_t j = 1; j <= T; ++j) {
    const int32_t pair = (q & tmask[j - 1]) ? match : mismatch;
    const int32_t a = prev[j - 1] + pair;
    const int32_t b = prev[j] + tgap;
    tmp[j] = a > b ? a : b;
  }
  row[0] = prev[0] + tgap;
  for (int32_t j = 1; j <= T; ++j) {
    const int32_t c = row[j - 1] + qgap;
    row[j] = tmp[j] > c ? tmp[j] : c;
  }
}

}  // namespace

extern "C" {

// Fill the final DP row: out_final[j] = S[Q][j] for j in 0..T.
// Returns the max over j in 1..T.
int32_t dp_final_row(const uint8_t* qmask, int32_t Q,
                     const uint8_t* tmask, int32_t T,
                     int32_t match, int32_t mismatch,
                     int32_t qgap, int32_t tgap,
                     int32_t* out_final) {
  std::vector<int32_t> prev(T + 1), cur(T + 1), tmp(T + 1);
  for (int32_t j = 0; j <= T; ++j) prev[j] = 0;
  for (int32_t i = 1; i <= Q; ++i) {
    fill_row(prev.data(), cur.data(), tmp.data(), tmask, T, qmask[i - 1],
             match, mismatch, qgap, tgap);
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
  std::vector<int32_t> tmp(T + 1);
  for (int32_t j = 0; j <= T; ++j) S[j] = 0;
  for (int32_t i = 1; i <= Q; ++i) {
    fill_row(&S[(size_t)(i - 1) * (T + 1)], &S[(size_t)i * (T + 1)],
             tmp.data(), tmask, T, qmask[i - 1], match, mismatch, qgap, tgap);
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

// ===========================================================================
// Full window finisher: DP + PAM extension + intra-window dedup in native
// code.  Mirrors SequentialGuideAligner.align's phases exactly
// (SequentialGuideAligner.scala:228-322); the Python engine is the oracle
// (differential-fuzzed in tests/test_native.py).
//
// The caller passes the DP query (guide in search orientation) and target
// masks for ONE pass (one strand arrangement); orientation flips and
// GuideAlignment construction stay in Python, applied only to the few
// returned alignments.
// ===========================================================================

namespace {

struct RawAln {
  int32_t tstart;   // 1-based
  int32_t tend;     // 1-based closed, incl. PAM extension
  int32_t score;
  int32_t pam_idx;  // -1 when PAM-less
  std::vector<char> ops;  // per-column ops incl. PAM ('=','X','I','D')
  int32_t gap_bases;      // count of I/D columns (for dedup tie-break)
  int32_t edits;          // mismatches + gaps (post-filter limit)
};

}  // namespace

extern "C" {

// Run one DP pass + extension + per-pass collection.
// pams: concatenated PAM masks; pam_off[k], pam_len[k] for k < n_pams.
// pam_is_lower ignored: PAM scoring always uses pam_* scores (the query
// bases of a PAM are lowercase by construction in the reference).
// Returns number of alignments kept (before cross-pass dedup), or <0 on
// buffer overflow.  Output arrays are per-alignment; ops are packed into
// out_ops with offsets/lengths.
int32_t search_pass(const uint8_t* qmask, int32_t Q,
                    const uint8_t* tmask, int32_t T,
                    const uint8_t* pams, const int32_t* pam_off,
                    const int32_t* pam_len, int32_t n_pams,
                    int32_t match, int32_t mismatch,
                    int32_t qgap, int32_t tgap,
                    int32_t pam_match, int32_t pam_mismatch,
                    int32_t min_score,
                    int32_t max_guide_diffs, int32_t max_pam_mismatches,
                    int32_t max_gap_before_extending, int32_t max_total_diffs,
                    int32_t max_out,
                    int32_t* out_tstart, int32_t* out_tend,
                    int32_t* out_score, int32_t* out_pam_idx,
                    int32_t* out_gap_bases, int32_t* out_edits,
                    char* out_ops, int32_t out_ops_cap,
                    int32_t* out_ops_off, int32_t* out_ops_len) {
  if (Q <= 0 || T <= 0) return 0;
  std::vector<int32_t> S((size_t)(Q + 1) * (T + 1));
  std::vector<int32_t> tmp(T + 1);
  for (int32_t j = 0; j <= T; ++j) S[j] = 0;
  for (int32_t i = 1; i <= Q; ++i) {
    fill_row(&S[(size_t)(i - 1) * (T + 1)], &S[(size_t)i * (T + 1)],
             tmp.data(), tmask, T, qmask[i - 1], match, mismatch, qgap, tgap);
  }

  const int32_t* frow = &S[(size_t)Q * (T + 1)];
  const bool pamless = (n_pams == 0) || (n_pams == 1 && pam_len[0] == 0);

  int32_t n_out = 0;
  int32_t ops_pos = 0;
  std::vector<char> rev_ops;
  rev_ops.reserve(Q + 64);

  for (int32_t end = 1; end <= T; ++end) {
    if (frow[end] < min_score) continue;
    // Traceback (diag > left(D) > up(I)).
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
          return -2;
        }
      }
    }
    const int32_t tstart = j + 1;
    const int32_t glen = (int32_t)rev_ops.size();

    // guide diffs = non-'=' ops (SequentialGuideAligner.scala:441-443)
    int32_t guide_diffs = 0;
    for (char c : rev_ops) if (c != '=') ++guide_diffs;
    if (guide_diffs > max_guide_diffs) continue;

    // guide ops in forward order
    std::vector<char> fw_ops(rev_ops.rbegin(), rev_ops.rend());

    if (pamless) {
      if (n_out >= max_out || ops_pos + glen > out_ops_cap) return -1;
      int32_t gaps = 0, edits = 0;
      for (char c : fw_ops) {
        if (c == 'I' || c == 'D') { ++gaps; ++edits; }
        else if (c == 'X') ++edits;
      }
      out_tstart[n_out] = tstart;
      out_tend[n_out] = end;
      out_score[n_out] = frow[end];
      out_pam_idx[n_out] = -1;
      out_gap_bases[n_out] = gaps;
      out_edits[n_out] = edits;
      out_ops_off[n_out] = ops_pos;
      out_ops_len[n_out] = glen;
      std::memcpy(out_ops + ops_pos, fw_ops.data(), glen);
      ops_pos += glen;
      ++n_out;
      continue;
    }

    // terminal indel reduces the allowed extra gap
    // (SequentialGuideAligner.scala:452-453); count the trailing run.
    int32_t terminal_gap = 0;
    if (!fw_ops.empty() && (fw_ops.back() == 'I' || fw_ops.back() == 'D')) {
      const char t = fw_ops.back();
      for (auto it = fw_ops.rbegin(); it != fw_ops.rend() && *it == t; ++it)
        ++terminal_gap;
    }
    int32_t max_extra_gap = max_gap_before_extending - terminal_gap;
    const int32_t budget = max_total_diffs - guide_diffs;
    if (budget < max_extra_gap) max_extra_gap = budget;

    for (int32_t p = 0; p < n_pams; ++p) {
      const uint8_t* pam = pams + pam_off[p];
      const int32_t plen = pam_len[p];
      int32_t best_offset = -1;
      int32_t best_total = INT32_MIN;
      uint32_t best_mm_mask = 0;  // bit per PAM base (plen <= 31)
      for (int32_t offset = 0; offset <= max_extra_gap; ++offset) {
        const int32_t t_off = end + offset;  // 0-based offset after aln
        int32_t limit = max_total_diffs - guide_diffs - offset;
        if (limit > max_pam_mismatches) limit = max_pam_mismatches;
        if (t_off + plen > T || limit < 0) continue;
        int32_t score = 0, n_mm = 0;
        uint32_t mm_mask = 0;
        for (int32_t k = 0; k < plen; ++k) {
          // PAM scoring: target N (mask 0) always mismatches; otherwise
          // IUPAC-compatible -> pam_match.  A base is '=' iff its addend
          // is positive (SequentialGuideAligner.scala:468), which differs
          // from compatibility only for degenerate scoring configs.
          const bool ok = (pam[k] & tmask[t_off + k]) != 0;
          const int32_t addend = ok ? pam_match : pam_mismatch;
          score += addend;
          if (addend <= 0) { ++n_mm; mm_mask |= (1u << k); }
        }
        if (n_mm > limit) continue;
        const int32_t total = score + offset * qgap;
        if (total > best_total) {  // earliest offset wins ties
          best_total = total;
          best_offset = offset;
          best_mm_mask = mm_mask;
        }
      }
      if (best_offset < 0) continue;
      const int32_t full_len = glen + best_offset + plen;
      if (n_out >= max_out || ops_pos + full_len > out_ops_cap) return -1;
      char* dst = out_ops + ops_pos;
      std::memcpy(dst, fw_ops.data(), glen);
      for (int32_t k = 0; k < best_offset; ++k) dst[glen + k] = 'D';
      for (int32_t k = 0; k < plen; ++k)
        dst[glen + best_offset + k] = (best_mm_mask & (1u << k)) ? 'X' : '=';
      int32_t gaps = 0, edits = 0;
      for (int32_t k = 0; k < full_len; ++k) {
        const char c = dst[k];
        if (c == 'I' || c == 'D') { ++gaps; ++edits; }
        else if (c == 'X') ++edits;
      }
      out_tstart[n_out] = tstart;
      out_tend[n_out] = end + best_offset + plen;
      out_score[n_out] = frow[end] + best_total;
      out_pam_idx[n_out] = p;
      out_gap_bases[n_out] = gaps;
      out_edits[n_out] = edits;
      out_ops_off[n_out] = ops_pos;
      out_ops_len[n_out] = full_len;
      ops_pos += full_len;
      ++n_out;
    }
  }
  return n_out;
}

}  // extern "C"
