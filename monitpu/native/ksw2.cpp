// monitpu oracle kernel: extension / global affine-gap DP with
// ksw2-extz semantics.
//
// Role: the host-side reference-semantics oracle for chain scoring and
// finalize. The reference aligns chains piecewise with ksw_extz2_sse
// (include/aligner/aligner_ksw2.hpp:2812 left context, :2844 right
// context, :2965 per-gap global, :2988/:3015 whole-read realign); this
// kernel reproduces that contract as used there:
//
//   * extension DP anchored at (0,0): leading gaps from the origin pay
//     affine cost, scores may go negative (global-style, no local
//     flooring);
//   * ez.mqe  = max score over cells in the last query row ("max score
//     reaching the end of the query"), ez.mqe_t = its 0-based target
//     index, smallest index on ties (ksw2 updates with strict > while
//     scanning anti-diagonals in increasing order);
//   * ez.score = score of the corner cell (end of query AND target) —
//     the value the reference uses for per-gap global alignments;
//   * KSW_EZ_RIGHT tie-breaking (the reference passes it on every
//     traceback call): on equal scores prefer E over diag and F over
//     both when recording the H source, and prefer gap-extension over
//     gap-open in the E/F recurrences, which right-aligns gaps;
//   * traceback from (qlen-1, mqe_t) under KSW_EZ_EXTZ_ONLY, from the
//     corner otherwise; CIGAR words are ksw2-encoded (len<<4 | op,
//     op 0=M 1=I 2=D, I consumes query, D consumes target).
//
// Deliberately omitted, with justification: the band (w) and zdrop are
// disabled in the reference configuration (config_t:112-115 w=-1,
// zdrop=-1), and end_bonus only influences ksw2's zdrop break
// heuristic, so with zdrop off it never changes scores or CIGARs —
// none of the three can affect the reference's output as configured.
//
// Alphabet: monitpu codes (0=SEP, 1..4=ACGT, 5=N). The reference maps
// every non-ACGT text byte (separators included) to nt4 code 4 = N and
// scores N as 0 against everything (ksw_gen_simple_mat,
// aligner_ksw2.hpp:3199-3211); boundary crossing is rejected AFTER
// alignment via seqidx::valid. We reproduce exactly that: SEP and N
// both score 0, no in-DP boundary penalty (unlike the TPU kernel in
// ops/sw.py which burns SEP in-DP; the post-hoc validity check is the
// oracle's job).
//
// Build: part of libmonitpu.so (see sais.py builder).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <thread>

namespace {

constexpr int32_t NEG = -(1 << 28);

inline int32_t nscore(int8_t a, int8_t b, int32_t sm, int32_t sx) {
  if (a == 0 || a == 5 || b == 0 || b == 5) return 0;  // N/SEP: matrix 0
  return a == b ? sm : -sx;
}

constexpr int32_t FLAG_SCORE_ONLY = 1;  // KSW_EZ_SCORE_ONLY
constexpr int32_t FLAG_EXTZ_ONLY = 2;   // KSW_EZ_EXTZ_ONLY (traceback @ mqe)

struct ExtzOut {
  int32_t score;   // corner cell H[qlen-1][tlen-1]
  int32_t mqe;     // max over last query row
  int32_t mqe_t;   // argmax target index (0-based), -1 if row empty
  int32_t n_cigar;
};

inline void push_op(uint32_t* cigar, int32_t& n, int64_t cap, uint32_t op) {
  if (n > 0 && (cigar[n - 1] & 0xf) == op) {
    cigar[n - 1] += 0x10;
  } else if (n < cap) {
    cigar[n++] = 0x10 | op;
  }
}

// dir bits: 0-1 H source (0 diag, 1 E, 2 F); 2: E extends; 3: F extends
void extz_lane(const int8_t* q, int32_t qlen, const int8_t* t, int32_t tlen,
               int32_t sm, int32_t sx, int32_t go, int32_t ge, int32_t flags,
               std::vector<int32_t>& H, std::vector<int32_t>& F,
               std::vector<uint8_t>& dirs, uint32_t* cigar, int64_t cigar_cap,
               ExtzOut* out) {
  out->n_cigar = 0;
  const bool want_cigar = !(flags & FLAG_SCORE_ONLY) && cigar != nullptr;
  // degenerate shapes: pure-gap closed forms (the reference never calls
  // ksw2 with an empty side; kept for safety)
  if (qlen == 0 || tlen == 0) {
    out->mqe = (tlen == 0 && qlen > 0) ? -(go + qlen * ge) : 0;
    out->mqe_t = -1;
    out->score = (qlen == 0 && tlen == 0) ? 0
                 : -(go + (qlen == 0 ? tlen : qlen) * ge);
    if (want_cigar && !(flags & FLAG_EXTZ_ONLY)) {
      if (qlen > 0) push_op(cigar, out->n_cigar, cigar_cap, 1),
          cigar[0] = (uint32_t(qlen) << 4) | 1;
      else if (tlen > 0) push_op(cigar, out->n_cigar, cigar_cap, 2),
          cigar[0] = (uint32_t(tlen) << 4) | 2;
    } else if (want_cigar && qlen > 0) {
      cigar[0] = (uint32_t(qlen) << 4) | 1;
      out->n_cigar = 1;
    }
    return;
  }

  H.assign(tlen + 1, 0);
  F.assign(tlen + 1, NEG);
  for (int32_t j = 0; j < tlen; ++j) H[j + 1] = -(go + (j + 1) * ge);
  if (want_cigar) dirs.assign((int64_t)qlen * tlen, 0);

  int32_t mqe = NEG, mqe_t = -1, corner = NEG;
  for (int32_t i = 0; i < qlen; ++i) {
    int32_t h_diag = (i == 0) ? 0 : -(go + i * ge);  // H[i-1][-1]
    int32_t h_left = -(go + (i + 1) * ge);           // H[i][-1]
    int32_t e = NEG;                                 // E[i][-1]
    uint8_t* drow = want_cigar ? dirs.data() + (int64_t)i * tlen : nullptr;
    for (int32_t j = 0; j < tlen; ++j) {
      // F: gap consuming query (vertical); tie prefers extension (RIGHT)
      int32_t f_ext = F[j + 1] - ge, f_open = H[j + 1] - go - ge;
      int32_t f = std::max(f_ext, f_open);
      // E: gap consuming target (horizontal); tie prefers extension
      int32_t e_ext = e - ge, e_open = h_left - go - ge;
      e = std::max(e_ext, e_open);
      int32_t m = h_diag + nscore(q[i], t[j], sm, sx);
      // KSW_EZ_RIGHT H-source: E beats diag on tie, F beats both on tie
      uint8_t d = (m > e) ? 0 : 1;
      int32_t h = std::max(m, e);
      if (f >= h) { d = 2; h = f; }
      if (want_cigar)
        drow[j] = d | (f_ext >= f_open ? 8 : 0) | (e_ext >= e_open ? 4 : 0);
      h_diag = H[j + 1];
      H[j + 1] = h;
      F[j + 1] = f;
      h_left = h;
    }
    if (i == qlen - 1) {
      for (int32_t j = 0; j < tlen; ++j)
        if (H[j + 1] > mqe) { mqe = H[j + 1]; mqe_t = j; }
      corner = H[tlen];
    }
  }
  out->mqe = mqe;
  out->mqe_t = mqe_t;
  out->score = corner;

  if (!want_cigar) return;
  // traceback
  int32_t i = qlen - 1;
  int32_t j = (flags & FLAG_EXTZ_ONLY) ? mqe_t : tlen - 1;
  std::vector<uint32_t> rev;
  rev.reserve(qlen + tlen);
  int state = 0;  // 0=H, 1=E, 2=F
  while (i >= 0 && j >= 0) {
    uint8_t d = dirs[(int64_t)i * tlen + j];
    if (state == 0) state = d & 3;
    if (state == 0) { rev.push_back(0); --i; --j; }
    else if (state == 1) { rev.push_back(2); if (!(d & 4)) state = 0; --j; }
    else { rev.push_back(1); if (!(d & 8)) state = 0; --i; }
  }
  while (i >= 0) { rev.push_back(1); --i; }  // leading query insertion
  while (j >= 0) { rev.push_back(2); --j; }  // leading target deletion
  int32_t n = 0;
  for (int64_t k = (int64_t)rev.size() - 1; k >= 0; --k)
    push_op(cigar, n, cigar_cap, rev[k]);
  out->n_cigar = n;
}

}  // namespace

extern "C" {

// Single-pair oracle call. Returns 0 on success.
int monitpu_extz(const int8_t* q, int32_t qlen, const int8_t* t,
                 int32_t tlen, int32_t smatch, int32_t smismatch,
                 int32_t gapo, int32_t gape, int32_t flags,
                 int32_t* out_score, int32_t* out_mqe, int32_t* out_mqe_t,
                 uint32_t* cigar, int32_t* n_cigar, int64_t cigar_cap) {
  std::vector<int32_t> H, F;
  std::vector<uint8_t> dirs;
  ExtzOut out;
  extz_lane(q, qlen, t, tlen, smatch, smismatch, gapo, gape, flags, H, F,
            dirs, cigar, cigar_cap, &out);
  *out_score = out.score;
  *out_mqe = out.mqe;
  *out_mqe_t = out.mqe_t;
  if (n_cigar) *n_cigar = out.n_cigar;
  return 0;
}

// Batched, threaded variant: L independent lanes with shared strides.
// queries int8[L, qstride], targets int8[L, tstride]; per-lane flags.
int monitpu_extz_batch(const int8_t* queries, const int32_t* qlens,
                       int64_t qstride, const int8_t* targets,
                       const int32_t* tlens, int64_t tstride,
                       const uint8_t* active, int64_t n_lanes,
                       int32_t smatch, int32_t smismatch, int32_t gapo,
                       int32_t gape, const int32_t* flags,
                       int32_t* out_score, int32_t* out_mqe,
                       int32_t* out_mqe_t, uint32_t* cigars,
                       int32_t* n_cigars, int64_t cigar_cap,
                       int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  auto work = [&](int64_t lo, int64_t hi) {
    std::vector<int32_t> H, F;
    std::vector<uint8_t> dirs;
    for (int64_t l = lo; l < hi; ++l) {
      if (active && !active[l]) { if (n_cigars) n_cigars[l] = 0; continue; }
      ExtzOut out;
      extz_lane(queries + l * qstride, qlens[l], targets + l * tstride,
                tlens[l], smatch, smismatch, gapo, gape, flags[l], H, F,
                dirs, cigars ? cigars + l * cigar_cap : nullptr, cigar_cap,
                &out);
      out_score[l] = out.score;
      out_mqe[l] = out.mqe;
      out_mqe_t[l] = out.mqe_t;
      if (n_cigars) n_cigars[l] = out.n_cigar;
    }
  };
  int64_t chunk = (n_lanes + n_threads - 1) / n_threads;
  for (int32_t th = 0; th < n_threads; ++th) {
    int64_t lo = th * chunk, hi = std::min<int64_t>(n_lanes, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(work, lo, hi);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
