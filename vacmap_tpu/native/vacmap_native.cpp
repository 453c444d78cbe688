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
