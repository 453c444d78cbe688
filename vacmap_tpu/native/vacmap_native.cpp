// vacmap-tpu native host kernels.
//
// TPU-native equivalents of the reference's C extension components
// (SURVEY.md section 2.6): the device (JAX/Pallas) kernels own the batched
// hot path; these C++ routines are the low-latency host implementations
// used for small/irregular jobs and as the always-available fallback.
//
//   * myers_edit_distance — blocked bit-parallel global edit distance
//     (divergence filter; replaces edlib, mammap_clrnano.py:19251)
//   * align2p_native      — banded two-piece affine DP with traceback
//     (replaces mp.k_cigar, mammap_clrnano.py:21554/:2381); identical
//     cost model and tie-breaking to ops/affine_ref.py
//
// Built as a plain shared library; Python binds via ctypes (no pybind11).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <utility>

extern "C" {

// ---------------------------------------------------------------------------
// Blocked Myers bit-parallel edit distance (Myers 1999, blocked as in
// Hyyro 2003): pattern = query b, text = a; O(na * nb/64).
// Returns the global (NW) distance; if cap >= 0 and the result exceeds
// cap, returns cap + 1 (exact decision, possibly early-outs on |na-nb|).
// ---------------------------------------------------------------------------
int64_t myers_edit_distance(const uint8_t* a, int64_t na,
                            const uint8_t* b, int64_t nb, int64_t cap) {
  if (na == 0) return (cap >= 0 && nb > cap) ? cap + 1 : nb;
  if (nb == 0) return (cap >= 0 && na > cap) ? cap + 1 : na;
  if (cap >= 0 && std::llabs(na - nb) > cap) return cap + 1;
  const int64_t W = (nb + 63) / 64;
  std::vector<uint64_t> Peq(5 * W, 0);
  for (int64_t i = 0; i < nb; i++) {
    uint8_t c = b[i] < 4 ? b[i] : 4;
    Peq[(size_t)c * W + i / 64] |= 1ull << (i % 64);
  }
  std::vector<uint64_t> Pv(W, ~0ull), Mv(W, 0);
  int64_t score = nb;
  const uint64_t HIGH = 1ull << ((nb - 1) % 64);
  for (int64_t j = 0; j < na; j++) {
    uint8_t c = a[j] < 4 ? a[j] : 4;
    const uint64_t* eqrow = &Peq[(size_t)c * W];
    int hin = 1;  // NW boundary: D(0, j) = j, so +1 enters every column
    for (int64_t w = 0; w < W; w++) {
      uint64_t Eq = eqrow[w];
      uint64_t Pv_w = Pv[w], Mv_w = Mv[w];
      uint64_t Xv = Eq | Mv_w;
      if (hin < 0) Eq |= 1ull;
      uint64_t Xh = (((Eq & Pv_w) + Pv_w) ^ Pv_w) | Eq;
      uint64_t Ph = Mv_w | ~(Xh | Pv_w);
      uint64_t Mh = Pv_w & Xh;
      uint64_t high = (w == W - 1) ? HIGH : (1ull << 63);
      int hout = 0;
      if (Ph & high) hout = 1;
      else if (Mh & high) hout = -1;
      Ph <<= 1;
      Mh <<= 1;
      if (hin < 0) Mh |= 1ull;
      else if (hin > 0) Ph |= 1ull;
      Pv[w] = Mh | ~(Xv | Ph);
      Mv[w] = Ph & Xv;
      hin = hout;
      if (w == W - 1) score += hout;
    }
  }
  if (cap >= 0 && score > cap) return cap + 1;
  return score;
}

// ---------------------------------------------------------------------------
// banded two-piece affine alignment with traceback.
// Band in offset d = j - i over [dlo, dhi]; H tie priority
// DIAG > DEL1 > DEL2 > INS1 > INS2 (matches ops/affine_ref.py).
// ops buffer receives (op, len) int32 pairs (op: 0=M 1=I 2=D).
// ---------------------------------------------------------------------------

static const float NEG = -1e30f;

int align2p_native(
    const uint8_t* target, int64_t T, const uint8_t* query, int64_t Q,
    int match, int mismatch, int o1, int e1, int o2, int e2,
    int bw, int zdrop, int glob,
    int32_t* out_ops, int64_t max_ops, int64_t* n_ops,
    int64_t* q_end, int64_t* t_end, int64_t* score_out, int* zdropped) {
  *n_ops = 0; *zdropped = 0;
  if (T == 0 || Q == 0) {
    int64_t k = 0;
    if (Q) { out_ops[k * 2] = 1; out_ops[k * 2 + 1] = (int32_t)Q; k++; }
    if (T) { out_ops[k * 2] = 2; out_ops[k * 2 + 1] = (int32_t)T; k++; }
    *n_ops = k; *q_end = Q; *t_end = T; *score_out = 0;
    return 0;
  }
  const int64_t w = glob ? (std::llabs(Q - T) + 1002) : bw;
  int64_t dlo = std::min<int64_t>(0, Q - T) - w;
  int64_t dhi = std::max<int64_t>(0, Q - T) + w;
  dlo = std::max<int64_t>(dlo, -T);
  dhi = std::min<int64_t>(dhi, Q);
  const int64_t Wb = dhi - dlo + 1;

  std::vector<float> Hrow(Wb, NEG), E1row(Wb, NEG), E2row(Wb, NEG);
  std::vector<float> Hnew(Wb, NEG), E1new(Wb, NEG), E2new(Wb, NEG);
  std::vector<uint8_t> tb((size_t)T * Wb);

  auto gapf = [&](int64_t l) -> float {
    return (float)std::min((int64_t)o1 + (int64_t)e1 * l,
                           (int64_t)o2 + (int64_t)e2 * l);
  };
  for (int64_t p = 0; p < Wb; p++) {
    int64_t j = p + dlo;
    if (j == 0) Hrow[p] = 0.0f;
    else if (j > 0 && j <= Q) Hrow[p] = -gapf(j);
  }
  float best = NEG;
  int64_t best_i = 0, best_j = 0;
  for (int64_t i = 1; i <= T; i++) {
    uint8_t* bits_row = &tb[(size_t)(i - 1) * Wb];
    float row_best = NEG;
    const float gapi = -gapf(i);
    float run1 = NEG, run2 = NEG;      // max(H0[p'] + p'*e_k) over p' < p+1
    float f1_prev = NEG, f2_prev = NEG;
    const uint8_t tch = target[i - 1];
    for (int64_t p = 0; p < Wb; p++) {
      const int64_t j = p + dlo + i;
      const bool inb = (j >= 1 && j <= Q);
      const float H_up = (p + 1 < Wb) ? Hrow[p + 1] : NEG;
      const float E1u = (p + 1 < Wb) ? E1row[p + 1] : NEG;
      const float E2u = (p + 1 < Wb) ? E2row[p + 1] : NEG;
      const float E1v = std::max(E1u - e1, H_up - o1 - e1);
      const float E2v = std::max(E2u - e2, H_up - o2 - e2);
      float diag = NEG;
      if (inb) {
        const float sub = (query[j - 1] == tch && tch < 4)
                              ? (float)match : (float)mismatch;
        diag = Hrow[p] + sub;
      }
      float H0 = std::max(diag, std::max(E1v, E2v));
      if (j == 0) H0 = gapi;
      const float F1v = run1 - (float)p * e1 - o1;
      const float F2v = run2 - (float)p * e2 - o2;
      float H = std::max(H0, std::max(F1v, F2v));
      if (j == 0) H = gapi;
      if (!inb && j != 0) { H = NEG; H0 = NEG; }

      uint8_t op = 0;
      if (H == F2v) op = 4;
      if (H == F1v) op = 3;
      if (H == E2v) op = 2;
      if (H == E1v) op = 1;
      if (H == diag) op = 0;
      uint8_t b = op;
      if (E1v == E1u - e1) b |= 8;
      if (E2v == E2u - e2) b |= 16;
      if (p > 0 && F1v == f1_prev - e1) b |= 32;
      if (p > 0 && F2v == f2_prev - e2) b |= 64;
      bits_row[p] = b;
      f1_prev = F1v; f2_prev = F2v;

      Hnew[p] = H; E1new[p] = E1v; E2new[p] = E2v;
      if (inb && H > row_best) { row_best = H; }
      // running maxima use H0 of p'<=p for F at p+1
      const float src = (inb || j == 0) ? H0 : NEG;
      run1 = std::max(run1, src + (float)p * e1);
      run2 = std::max(run2, src + (float)p * e2);
    }
    std::swap(Hrow, Hnew); std::swap(E1row, E1new); std::swap(E2row, E2new);
    // best cell (for extension mode): scan the (already swapped) row
    for (int64_t p = 0; p < Wb; p++) {
      const int64_t j = p + dlo + i;
      if (j >= 1 && j <= Q && Hrow[p] > best) {
        best = Hrow[p]; best_i = i; best_j = j;
      }
    }
    if (!glob && zdrop >= 0 && best - row_best > (float)zdrop) {
      *zdropped = 1;
      break;
    }
  }
  int64_t ei, ej;
  if (glob) {
    ei = T; ej = Q;
    *score_out = (int64_t)llroundf(Hrow[Q - T - dlo]);
  } else {
    ei = best_i; ej = best_j;
    *score_out = (int64_t)llroundf(best);
  }
  *q_end = ej; *t_end = ei;

  // traceback (state machine identical to affine_ref._traceback)
  int64_t i = ei, j = ej;
  int state = 0;
  std::vector<std::pair<int, int64_t>> rev;
  auto push = [&](int op, int64_t len) {
    if (!rev.empty() && rev.back().first == op) rev.back().second += len;
    else rev.push_back({op, len});
  };
  while (i > 0 || j > 0) {
    if (i == 0) { push(1, j); break; }
    if (j == 0) { push(2, i); break; }
    const int64_t p = j - i - dlo;
    const uint8_t b = tb[(size_t)(i - 1) * Wb + p];
    if (state == 0) {
      const int op = b & 7;
      if (op == 0) { push(0, 1); i--; j--; }
      else if (op == 1) state = 1;
      else if (op == 2) state = 2;
      else if (op == 3) state = 3;
      else state = 4;
    } else if (state == 1 || state == 2) {
      push(2, 1);
      const bool ext = b & (state == 1 ? 8 : 16);
      i--;
      if (!ext) state = 0;
    } else {
      push(1, 1);
      const bool ext = b & (state == 3 ? 32 : 64);
      j--;
      if (!ext) state = 0;
    }
  }
  int64_t k = 0;
  for (auto it = rev.rbegin(); it != rev.rend(); ++it) {
    if (k >= max_ops) return -2;
    out_ops[k * 2] = it->first;
    out_ops[k * 2 + 1] = (int32_t)it->second;
    k++;
  }
  *n_ops = k;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Non-linear chaining DP (exact), C++ host kernel.
//
// Same recurrence/tie-breaks as ops/chain_ref.chain_dp: for each anchor i,
// candidates are all anchors with a strictly smaller barrier key, scanned
// in descending (S, index) order with the lossless early break
// S[j] <= running_max - len_i (the reference's S_arg scan,
// mammap_clrnano.py:24828/24944).  variant: 0=global 1=refund 2=fine
// 3=mismatch.  Anchors must be barrier-sorted (readpos, or readpos+len
// for local variants).  extra[] table passed in from Python so the
// surcharge matches bit-for-bit.
// ---------------------------------------------------------------------------

extern "C" int chain_dp_native(
    const int64_t* anchors, int64_t n,  // rows of (readpos, refpos, strand, len)
    int kmersize, double skipcost, int maxdiff, int maxgap, int variant,
    const float* extra, int64_t extra_size,  // extra table (len = extra_size+1)
    double* S_out, int64_t* P_out, int64_t max_ops_per_anchor) {
  if (n == 0) return 0;
  const bool local = (variant == 2 || variant == 3);
  const bool refund = (variant == 1);

  // colinear gap-cost table
  std::vector<double> gapcost_list(maxdiff + 1, 0.0);
  for (int g = 1; g <= maxdiff; g++) {
    double coef = (local && g > 10) ? 2.0 : 0.5;
    gapcost_list[g] = 0.01 * kmersize * g + coef * std::log2((double)g);
  }
  // fine-variant colinear readgap cost (float32 table in the reference)
  std::vector<double> readgapcost(100, 0.0);
  for (int g = 1; g < 100; g++) readgapcost[g] = (float)(0.1 * std::log2(g + 1.0));
  // mismatch-variant large readgap cost
  std::vector<double> lrg(maxgap + 1, 0.0);
  for (int g = 1; g <= maxgap; g++)
    lrg[g] = (float)((g >= 30) ? 0.5 * g : 0.1 * std::log2(g + 1.0));

  auto A = [&](int64_t i, int c) { return anchors[i * 4 + c]; };

  // adaptive repeat penalties (global variant)
  std::vector<double> skip_i(n, skipcost);
  std::vector<int> maxdiff_i(n, maxdiff);
  if (variant == 0) {
    int64_t maxr = 0;
    for (int64_t i = 0; i < n; i++) maxr = std::max(maxr, A(i, 0));
    std::vector<int32_t> cov(maxr + 1, 0);
    for (int64_t i = 0; i < n; i++) {
      int64_t r = A(i, 0);
      if (cov[r] < 20) cov[r]++;
    }
    for (int64_t i = 0; i < n; i++) {
      skip_i[i] = skipcost + cov[A(i, 0)];
      maxdiff_i[i] = std::max(maxdiff - cov[A(i, 0)], 10);
    }
  }

  std::vector<double> fixed_pen, pre_pen;
  if (refund) { fixed_pen.assign(n, 0.0); pre_pen.assign(n, 0.0); }

  std::vector<int64_t> barrier(n);
  for (int64_t i = 0; i < n; i++)
    barrier[i] = A(i, 0) + (local ? A(i, 3) : 0);

  // sorted candidate order: ascending (S, index); binary insert per group
  std::vector<int64_t> order;  // candidate indices sorted ascending by (S, idx)
  order.reserve(n);
  std::vector<double> S(n, 0.0);
  std::vector<int64_t> P(n, -1);

  S[0] = (double)A(0, 3);
  int64_t inserted = 0;  // anchors currently in `order`
  int64_t prebarrier = barrier[0];
  int64_t opcount = 0;

  auto insert_sorted = [&](int64_t k) {
    double s = S[k];
    int64_t lo = 0, hi = (int64_t)order.size();
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (S[order[mid]] < s || (S[order[mid]] == s && order[mid] < k)) lo = mid + 1;
      else hi = mid;
    }
    order.insert(order.begin() + lo, k);
  };

  for (int64_t i = 0; i < n; i++) {
    if (i > 0 && prebarrier < barrier[i]) {
      while (inserted < i) insert_sorted(inserted++);
      prebarrier = barrier[i];
    }
    const int64_t r_i = A(i, 0), y_i = A(i, 1), s_i = A(i, 2), l_i = A(i, 3);
    double max_scores = (double)l_i;
    int64_t pre_index = -1;
    bool win_col = false;
    int64_t win_bonus = 0;
    // descending (S, idx) scan with early break
    for (int64_t oi = (int64_t)order.size() - 1; oi >= 0; oi--) {
      const int64_t j = order[oi];
      if (barrier[j] >= barrier[i]) continue;  // safety (shouldn't happen)
      if (!(S[j] > max_scores - (double)l_i)) break;
      opcount++;
      const int64_t r_j = A(j, 0), y_j = A(j, 1), s_j = A(j, 2), l_j = A(j, 3);
      int64_t readgap = r_i - r_j - l_j;
      int64_t bonus, refgap;
      const bool same = (s_i == s_j);
      if (readgap < 0) {
        bonus = r_i + l_i - r_j - l_j;
        if (local && bonus <= 0) continue;
        const int64_t overlap = r_j + l_j - r_i;
        readgap = 0;
        if (same) {
          refgap = (s_i == 1) ? (y_i + overlap - (y_j + l_j)) : (y_j - (y_i + bonus));
        } else {
          refgap = (s_j == -1) ? (y_i + overlap - y_j + 1)
                               : (y_i + bonus - 1 - (y_j + l_j));
        }
      } else {
        bonus = l_i;
        if (same) {
          refgap = (s_i == 1) ? (y_i - y_j - l_j) : (y_j - y_i - l_i);
        } else {
          refgap = (s_j == -1) ? (y_i - y_j + 1) : (y_i + l_i - 1 - y_j - l_j);
        }
      }
      int64_t gapcost = std::llabs(readgap - refgap);
      const bool colinear =
          same && refgap >= 0 && readgap <= maxgap && gapcost <= maxdiff_i[i];
      double ts;
      if (colinear) {
        ts = S[j] + bonus - gapcost_list[gapcost];
        if (variant == 2) ts -= readgapcost[std::min<int64_t>(readgap, 99)];
        else if (variant == 3) ts -= lrg[std::min<int64_t>(readgap, maxgap)];
        else if (refund && fixed_pen[j] < 0 && fixed_pen[j] + bonus >= 0)
          ts += pre_pen[j];
      } else {
        const int64_t gc = std::min(gapcost, extra_size);
        if (variant == 0) ts = S[j] - skip_i[i] + bonus - (double)extra[gc];
        else if (variant == 1) ts = S[j] + bonus - skip_i[i];
        else if (variant == 2) {
          const double pen = (same ? skipcost : std::min(50.0, skipcost)) +
                             (double)extra[gc];
          ts = S[j] + bonus - pen;
        } else {
          ts = S[j] + bonus -
               (skipcost + (float)(0.5 * std::log2((double)std::min<int64_t>(
                                        gapcost, 99999) + 1.0)));
        }
      }
      if (ts > max_scores) {
        max_scores = ts;
        pre_index = j;
        win_col = colinear;
        win_bonus = bonus;
      }
    }
    S[i] = max_scores;
    P[i] = pre_index;
    if (refund && pre_index >= 0) {
      const int64_t j = pre_index;
      if (win_col) {
        if (fixed_pen[j] < 0 && fixed_pen[j] + win_bonus < 0) {
          fixed_pen[i] = fixed_pen[j] + win_bonus;
          pre_pen[i] = pre_pen[j];
        }
      } else {
        fixed_pen[i] = -skip_i[i] + win_bonus;
        pre_pen[i] = skip_i[i];
      }
    }
  }
  for (int64_t i = 0; i < n; i++) { S_out[i] = S[i]; P_out[i] = P[i]; }
  if (max_ops_per_anchor > 0 && opcount / std::max<int64_t>(n, 1) > max_ops_per_anchor)
    return 1;  // density abort signal (caller switches to fast path)
  return 0;
}
