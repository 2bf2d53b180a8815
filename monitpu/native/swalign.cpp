// monitpu native finalize: fitting alignment with traceback + MD/NM.
//
// Role: the per-winner CIGAR/MD pass of the aligner (reference
// fill_chain's score_only=false arm, aligner_ksw2.hpp:3001-3174). The
// batched score pass runs on TPU (monitpu/ops/sw.py); only the ONE
// winning chain per read needs a traceback, and doing it host-side in
// C++ avoids shipping O(Q*T) direction bits over the device tunnel.
// Scoring semantics identical to the TPU kernel: match/mismatch over
// A,C,G,T; N (code 5) scores 0 vs anything; SEP (code 0) scores -2^14;
// affine gaps (gapo+gape per gap open, gape per extension); full query,
// free target start/end. Tie-breaking prefers gaps (right-aligned),
// matching the kernel's documented choice.
//
// Build: part of libmonitpu.so (see sais.py builder).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <algorithm>
#include <thread>

namespace {

constexpr int32_t NEG = -(1 << 28);
constexpr int32_t SEP_SCORE = -(1 << 14);

inline int32_t char_score(int8_t q, int8_t t, int32_t sm, int32_t sx) {
  if (q == 0 || t == 0) return SEP_SCORE;
  if (q == 5 || t == 5) return 0;
  return q == t ? sm : -sx;
}

struct LaneOut {
  int32_t score, tstart, rlen, ncigar, mdlen, nm;
};

// dir bits: 0-1 H source (0 diag, 1 E, 2 F); 2: E extends; 3: F extends
void fit_align_lane(const int8_t* q, int32_t qlen, const int8_t* t,
                    int32_t tlen, int32_t sm, int32_t sx, int32_t go,
                    int32_t ge, uint8_t* dirs /* qlen*tlen */,
                    std::vector<int32_t>& H, std::vector<int32_t>& E,
                    std::vector<int32_t>& F,
                    uint32_t* cigar, int64_t cigar_cap,
                    const char* dec /* code->char */, char* md,
                    int64_t md_cap, LaneOut* out) {
  // row -1: free target start
  H.assign(tlen + 1, 0);
  H[0] = 0;  // H[-1][-1]
  F.assign(tlen + 1, NEG);
  int32_t best = NEG, bestj = -1;

  for (int32_t i = 0; i < qlen; ++i) {
    int32_t h_diag = (i == 0) ? 0 : -(go + i * ge);   // H[i-1][-1]
    int32_t h_left = -(go + (i + 1) * ge);            // H[i][-1]
    int32_t e = NEG;
    uint8_t* drow = dirs + (int64_t)i * tlen;
    for (int32_t j = 0; j < tlen; ++j) {
      int32_t f = std::max(F[j + 1] - ge, H[j + 1] - go - ge);
      bool f_ext = (f == F[j + 1] - ge);
      int32_t diag = h_diag + char_score(q[i], t[j], sm, sx);
      int32_t U = std::max(diag, f);
      int32_t e_new = std::max(e - ge, h_left - go - ge);
      bool e_ext = (e_new == e - ge);
      int32_t h = std::max(U, e_new);
      uint8_t d;
      if (e_new >= U) d = 1;            // prefer gap along target
      else if (f >= diag) d = 2;        // then gap along query
      else d = 0;
      d |= (e_ext ? 4 : 0) | (f_ext ? 8 : 0);
      drow[j] = d;
      h_diag = H[j + 1];
      H[j + 1] = h;
      F[j + 1] = f;
      e = e_new;
      h_left = h;
      if (i == qlen - 1 && h > best) { best = h; bestj = j; }
    }
  }

  out->score = best;
  // traceback
  int32_t i = qlen - 1, j = bestj;
  int64_t nops = 0;
  auto push = [&](char op, uint32_t l) {
    if (nops > 0 && (char)(cigar[nops - 1] & 0xf) == (op == 'M' ? 0 : op == 'I' ? 1 : 2)) {
      cigar[nops - 1] += l << 4;
    } else if (nops < cigar_cap) {
      uint32_t code = op == 'M' ? 0 : op == 'I' ? 1 : 2;
      cigar[nops++] = (l << 4) | code;
    }
  };
  int state = 0;  // 0=H, 1=E, 2=F
  while (i >= 0) {
    if (j < 0) { push('I', 1); --i; continue; }
    uint8_t d = dirs[(int64_t)i * tlen + j];
    if (state == 0) {
      int src = d & 3;
      if (src == 0) { push('M', 1); --i; --j; }
      else if (src == 1) state = 1;
      else state = 2;
    } else if (state == 1) {
      push('D', 1);
      if (!(d & 4)) state = 0;
      --j;
    } else {
      push('I', 1);
      if (!(d & 8)) state = 0;
      --i;
    }
  }
  out->tstart = j + 1;
  std::reverse(cigar, cigar + nops);
  out->ncigar = (int32_t)nops;

  // MD + NM walk (write_MD_core semantics, reference sam.hpp:249-287)
  int64_t mdl = 0;
  int32_t nm = 0, l_md = 0;
  int32_t qi = 0, tj = out->tstart;
  auto md_num = [&](int32_t v) {
    char buf[12];
    int n = snprintf(buf, sizeof buf, "%d", v);
    for (int k = 0; k < n && mdl < md_cap; ++k) md[mdl++] = buf[k];
  };
  for (int64_t c = 0; c < nops; ++c) {
    uint32_t l = cigar[c] >> 4;
    switch (cigar[c] & 0xf) {
      case 0:
        for (uint32_t k = 0; k < l; ++k) {
          if (q[qi] != t[tj]) {
            md_num(l_md);
            if (mdl < md_cap) md[mdl++] = dec[(int)t[tj]];
            l_md = 0;
            ++nm;
          } else ++l_md;
          ++qi; ++tj;
        }
        break;
      case 1:
        qi += l; nm += l;
        break;
      case 2:
        md_num(l_md);
        if (mdl < md_cap) md[mdl++] = '^';
        for (uint32_t k = 0; k < l && mdl < md_cap; ++k)
          md[mdl++] = dec[(int)t[tj + k]];
        l_md = 0;
        tj += l; nm += l;
        break;
    }
  }
  md_num(l_md);
  out->mdlen = (int32_t)mdl;
  out->nm = nm;
  out->rlen = tj - out->tstart;
}

// Banded variant: the TPU score pass already knows the optimal end
// column (tend) and score, so the traceback DP only needs a band of
// width 2*bw+1 around the diagonal ending at (qlen-1, tend) — ~T/(2bw)
// times less work than the full fitting DP. Returns false (caller
// falls back to the full DP) when the banded optimum misses the
// expected score or the traceback walks out of the band.
bool fit_align_lane_banded(const int8_t* q, int32_t qlen, const int8_t* t,
                           int32_t tlen, int32_t tend, int32_t expected,
                           int32_t bw, int32_t sm, int32_t sx, int32_t go,
                           int32_t ge, std::vector<uint8_t>& dirs_v,
                           std::vector<int32_t>& H, std::vector<int32_t>& F,
                           uint32_t* cigar, int64_t cigar_cap,
                           const char* dec, char* md, int64_t md_cap,
                           LaneOut* out) {
  if (tend < 0 || tend >= tlen) return false;
  const int32_t stride = 2 * bw + 1;
  dirs_v.resize((int64_t)qlen * stride);
  uint8_t* dirs = dirs_v.data();
  auto jlo_of = [&](int32_t i) {
    int32_t c = tend - (qlen - 1 - i);
    return std::max(0, c - bw);
  };
  H.assign(tlen + 1, 0);   // row -1: free target start
  F.assign(tlen + 1, NEG);
  int32_t best = NEG, bestj = -1;
  int32_t prev_jhi = tlen - 1;  // row -1 is defined everywhere

  for (int32_t i = 0; i < qlen; ++i) {
    int32_t c = tend - (qlen - 1 - i);
    int32_t jlo = std::max(0, c - bw), jhi = std::min(tlen - 1, c + bw);
    if (jlo > jhi) return false;
    // invalidate prev-row cells newly exposed on the right edge
    for (int32_t j = prev_jhi + 1; j <= jhi; ++j) H[j + 1] = NEG;
    int32_t h_diag;   // H[i-1][jlo-1]
    if (jlo == 0) h_diag = (i == 0) ? 0 : -(go + i * ge);
    else if (i == 0) h_diag = 0;
    else h_diag = H[jlo];
    int32_t h_left = (jlo == 0) ? -(go + (i + 1) * ge) : NEG;
    int32_t e = NEG;
    uint8_t* drow = dirs + (int64_t)i * stride;
    for (int32_t j = jlo; j <= jhi; ++j) {
      int32_t f = std::max(F[j + 1] - ge, H[j + 1] - go - ge);
      bool f_ext = (f == F[j + 1] - ge);
      int32_t diag = h_diag + char_score(q[i], t[j], sm, sx);
      int32_t U = std::max(diag, f);
      int32_t e_new = std::max(e - ge, h_left - go - ge);
      bool e_ext = (e_new == e - ge);
      int32_t h = std::max(U, e_new);
      uint8_t d;
      if (e_new >= U) d = 1;
      else if (f >= diag) d = 2;
      else d = 0;
      d |= (e_ext ? 4 : 0) | (f_ext ? 8 : 0);
      drow[j - jlo] = d;
      h_diag = H[j + 1];
      H[j + 1] = h;
      F[j + 1] = f;
      e = e_new;
      h_left = h;
      if (i == qlen - 1 && h > best) { best = h; bestj = j; }
    }
    if (jlo > 0) H[jlo] = NEG;   // left edge cell leaving the band
    prev_jhi = jhi;
  }
  if (best != expected || bestj != tend) return false;

  out->score = best;
  int32_t i = qlen - 1, j = bestj;
  int64_t nops = 0;
  auto push = [&](char op, uint32_t l) {
    uint32_t code = op == 'M' ? 0 : op == 'I' ? 1 : 2;
    if (nops > 0 && (cigar[nops - 1] & 0xf) == code) cigar[nops - 1] += l << 4;
    else if (nops < cigar_cap) cigar[nops++] = (l << 4) | code;
  };
  int state = 0;
  while (i >= 0) {
    if (j < 0) { push('I', 1); --i; continue; }
    int32_t off = j - jlo_of(i);
    if (off < 0 || off >= stride) return false;   // left the band
    uint8_t d = dirs[(int64_t)i * stride + off];
    if (state == 0) {
      int src = d & 3;
      if (src == 0) { push('M', 1); --i; --j; }
      else if (src == 1) state = 1;
      else state = 2;
    } else if (state == 1) {
      push('D', 1);
      if (!(d & 4)) state = 0;
      --j;
    } else {
      push('I', 1);
      if (!(d & 8)) state = 0;
      --i;
    }
  }
  out->tstart = j + 1;
  std::reverse(cigar, cigar + nops);
  out->ncigar = (int32_t)nops;

  int64_t mdl = 0;
  int32_t nm = 0, l_md = 0, qi = 0, tj = out->tstart;
  auto md_num = [&](int32_t v) {
    char buf[12];
    int nn = snprintf(buf, sizeof buf, "%d", v);
    for (int k = 0; k < nn && mdl < md_cap; ++k) md[mdl++] = buf[k];
  };
  for (int64_t cidx = 0; cidx < nops; ++cidx) {
    uint32_t l = cigar[cidx] >> 4;
    switch (cigar[cidx] & 0xf) {
      case 0:
        for (uint32_t k = 0; k < l; ++k) {
          if (q[qi] != t[tj]) {
            md_num(l_md);
            if (mdl < md_cap) md[mdl++] = dec[(int)t[tj]];
            l_md = 0;
            ++nm;
          } else ++l_md;
          ++qi; ++tj;
        }
        break;
      case 1: qi += l; nm += l; break;
      case 2:
        md_num(l_md);
        if (mdl < md_cap) md[mdl++] = '^';
        for (uint32_t k = 0; k < l && mdl < md_cap; ++k)
          md[mdl++] = dec[(int)t[tj + k]];
        l_md = 0;
        tj += l; nm += l;
        break;
    }
  }
  md_num(l_md);
  out->mdlen = (int32_t)mdl;
  out->nm = nm;
  out->rlen = tj - out->tstart;
  return true;
}

}  // namespace

extern "C" {

// Batched fitting alignment with traceback. Arrays are dense per-lane:
// queries[lane*qstride], targets[lane*tstride], cigar[lane*cigar_cap],
// md[lane*md_cap]. active[lane]==0 lanes are skipped (outputs zeroed).
// tends/expected: per-lane device-known optimal end column and score
// enabling the banded fast path (pass tends=nullptr to force full DP).
int monitpu_fit_align_batch(
    const int8_t* queries, const int32_t* qlens, int64_t qstride,
    const int8_t* targets, const int32_t* tlens, int64_t tstride,
    const uint8_t* active, int64_t n_lanes,
    int32_t smatch, int32_t smismatch, int32_t gapo, int32_t gape,
    const int32_t* tends, const int32_t* expected, int32_t band_w,
    int32_t* out_score, int32_t* out_tstart, int32_t* out_rlen,
    uint32_t* out_cigar, int32_t* out_ncigar, int64_t cigar_cap,
    char* out_md, int32_t* out_mdlen, int64_t md_cap,
    int32_t* out_nm, int32_t n_threads) {
  static const char dec[7] = "$ACGTN";
  if (n_threads < 1) n_threads = 1;

  auto worker = [&](int64_t lo, int64_t hi) {
    std::vector<int32_t> H, E, F;
    std::vector<uint8_t> dirs;
    for (int64_t lane = lo; lane < hi; ++lane) {
      LaneOut o{};
      if (active[lane] && qlens[lane] > 0 && tlens[lane] > 0) {
        bool done = false;
        if (tends && band_w > 0)
          done = fit_align_lane_banded(
              queries + lane * qstride, qlens[lane],
              targets + lane * tstride, tlens[lane],
              tends[lane], expected ? expected[lane] : NEG, band_w,
              smatch, smismatch, gapo, gape, dirs, H, F,
              out_cigar + lane * cigar_cap, cigar_cap, dec,
              out_md + lane * md_cap, md_cap, &o);
        if (!done) {
          dirs.resize((int64_t)qlens[lane] * tlens[lane]);
          fit_align_lane(queries + lane * qstride, qlens[lane],
                         targets + lane * tstride, tlens[lane],
                         smatch, smismatch, gapo, gape, dirs.data(), H, E, F,
                         out_cigar + lane * cigar_cap, cigar_cap, dec,
                         out_md + lane * md_cap, md_cap, &o);
        }
      }
      out_score[lane] = o.score;
      out_tstart[lane] = o.tstart;
      out_rlen[lane] = o.rlen;
      out_ncigar[lane] = o.ncigar;
      out_mdlen[lane] = o.mdlen;
      out_nm[lane] = o.nm;
    }
  };

  if (n_threads == 1 || n_lanes < 4) {
    worker(0, n_lanes);
  } else {
    std::vector<std::thread> ths;
    int64_t per = (n_lanes + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * per, hi = std::min<int64_t>(lo + per, n_lanes);
      if (lo < hi) ths.emplace_back(worker, lo, hi);
    }
    for (auto& th : ths) th.join();
  }
  return 0;
}

}  // extern "C"
