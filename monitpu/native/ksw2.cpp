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

#include "extz_core.h"

using monitpu::ExtzOut;
using monitpu::extz_lane;

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

// Banded-with-certificate variant (extz_core.h extz_lane_banded),
// exported for the fuzz test that pins it bit-exact against the full
// lane (tests/test_swalign_native.py). `need`/`band0` as documented on
// the kernel.
int monitpu_extz_banded(const int8_t* q, int32_t qlen, const int8_t* t,
                        int32_t tlen, int32_t smatch, int32_t smismatch,
                        int32_t gapo, int32_t gape, int32_t flags,
                        int32_t need, int32_t band0, int32_t* out_score,
                        int32_t* out_mqe, int32_t* out_mqe_t,
                        uint32_t* cigar, int32_t* n_cigar,
                        int64_t cigar_cap) {
  std::vector<int32_t> H, F;
  std::vector<uint8_t> dirs;
  ExtzOut out;
  monitpu::extz_lane_banded(q, qlen, t, tlen, smatch, smismatch, gapo, gape,
                            flags, need, band0, H, F, dirs, cigar, cigar_cap,
                            &out);
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
