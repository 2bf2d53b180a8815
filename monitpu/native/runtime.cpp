// monitpu native post-seed runtime (single-end).
//
// The TPU computes the index-bound stages (MS backward search, MEM
// extraction, Phi-walk occurrence enumeration) for a whole read batch;
// this runtime consumes those seeds and performs everything the
// reference does after populate_seeds, with reference-faithful
// semantics so SAM output matches the oracle (monitpu/oracle/se.py)
// field-for-field:
//
//   * seed_freq_filter          (include/aligner/aligner_ksw2.hpp:1905-1933)
//   * per-genome n_seeds_thr    (include/aligner/seed_finder.hpp:187-193)
//   * find_chains[_secondary]   (include/aligner/chain.hpp:221-442, 442-727)
//   * check_k selection w/ check_left_MEM + region dedup + AA ties
//                               (aligner_ksw2.hpp:394-521, 525-597)
//   * piecewise chain_score / fill_chain with extz semantics
//                               (aligner_ksw2.hpp:2018-2098, 2752-3196)
//   * write_MD_core MD/NM       (include/common/sam.hpp:249-287)
//   * levioSAM-style liftover   (include/aligner/liftidx.hpp:89-95,159-164)
//
// Reads are independent: the batch is sharded over a thread pool (the
// analog of the reference's mt_align pthread pump,
// align_reads_dispatcher.hpp:118-198).
//
// Build: part of libmonitpu.so (see sais.py builder).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <chrono>
#include <vector>

#include "extz_core.h"

namespace {

using monitpu::ExtzOut;
using monitpu::extz_lane;
using monitpu::FLAG_SCORE_ONLY;
using monitpu::FLAG_EXTZ_ONLY;

constexpr int64_t NEG_INF = INT32_MIN;  // fill_chain invalid marker (:2998)

struct Mem {
  int64_t pos;   // first occurrence (walk start)
  int32_t len;
  int32_t idx;   // position in the read
  int32_t mate;  // MATE_1|MATE_F = 0 / MATE_1|MATE_RC = 2
  int64_t rpos;  // chaining read position: idx + len - 1
  std::vector<int64_t> occs;
};

struct Chain {
  int64_t score;
  int32_t mate;
  bool paired;
  std::vector<int32_t> anchors;  // indices into anchor list, end-first
};

#pragma pack(push, 8)
struct SeParams {
  double freq_thr;
  int64_t G;
  int32_t min_len, check_k, region_dist;
  int32_t filter_freq, left_mem_check, secondary;
  int32_t filter_seeds, n_seeds_thr;
  int32_t max_dist_x, max_dist_y, max_iter, max_pred;
  int32_t min_chain_score, min_chain_length;
  int32_t smatch, smismatch, gapo, gape, gapo2, gape2, ext_len;
  int32_t n_threads, cigar_cap, md_cap, alt_cap;
};
#pragma pack(pop)

struct Ctx {
  const int8_t* text;
  int64_t n;
  const int64_t* seq_starts;  // [nseq + 1]
  int32_t nseq;
  const int64_t* lift_hs;
  const int64_t* lift_rs;
  const uint8_t* lift_ins;
  const int64_t* lift_se;
  int64_t n_lift;  // 0 = identity lift
  const SeParams* p;
};

// ---- seqidx surface (include/common/seqidx.hpp:149-167) ----

int32_t seq_of(const Ctx& c, int64_t pos) {
  // searchsorted(side="right") - 1, clamped
  const int64_t* b = c.seq_starts;
  int32_t s =
      int32_t(std::upper_bound(b, b + c.nseq + 1, pos) - b) - 1;
  return std::max(0, std::min(s, c.nseq - 1));
}

bool seq_valid(const Ctx& c, int64_t pos, int64_t len) {
  int32_t s = seq_of(c, pos);
  return pos + len <= c.seq_starts[s + 1];
}

// ---- liftover (monitpu/index/liftover.py, global segment table) ----

int64_t lift_seg(const Ctx& c, int64_t pos) {
  const int64_t* b = c.lift_hs;
  int64_t k = std::upper_bound(b, b + c.n_lift, pos) - b - 1;
  return std::max<int64_t>(0, std::min(k, c.n_lift - 1));
}

int64_t lift_pos(const Ctx& c, int64_t pos) {
  if (c.n_lift == 0) return pos;
  int64_t k = lift_seg(c, pos);
  if (c.lift_ins[k]) return c.lift_rs[k];
  return c.lift_rs[k] + (pos - c.lift_hs[k]);
}

using Cigar = std::vector<std::pair<uint8_t, int32_t>>;  // 0=M 1=I 2=D

void cig_push(Cigar& out, uint8_t op, int32_t l) {
  if (l <= 0) return;
  if (!out.empty() && out.back().first == op)
    out.back().second += l;
  else
    out.emplace_back(op, l);
}

// (hap pos, ops) -> (ref pos, lifted ops); empty ops = inside insertion
bool lift_cigar(const Ctx& c, int64_t pos, const Cigar& ops,
                int64_t* out_pos, Cigar& out) {
  out.clear();
  if (c.n_lift == 0) {
    *out_pos = pos;
    out = ops;
    return true;
  }
  int64_t h = pos;
  int64_t ref_pos = -1, last_ref = -1;
  for (const auto& [op, ln] : ops) {
    if (op == 1) {  // I: no hap consumption
      cig_push(out, 1, ln);
      continue;
    }
    int64_t remaining = ln;
    while (remaining > 0) {
      int64_t k = lift_seg(c, h);
      int64_t seg_end = c.lift_se[k];
      int64_t take = std::min(remaining, std::max<int64_t>(seg_end - h, 0));
      bool in_ins;
      int64_t r = 0;
      if (take <= 0) {  // past final segment: treat as insertion
        take = remaining;
        in_ins = true;
      } else {
        in_ins = c.lift_ins[k] != 0;
        r = c.lift_rs[k] + (h - c.lift_hs[k]);
      }
      if (in_ins) {
        if (op == 0) cig_push(out, 1, int32_t(take));
        // D over inserted bases vanishes in ref space
      } else {
        if (last_ref >= 0 && r > last_ref)
          cig_push(out, 2, int32_t(r - last_ref));
        if (ref_pos < 0) ref_pos = r;
        cig_push(out, op, int32_t(take));
        last_ref = r + take;
      }
      h += take;
      remaining -= take;
    }
  }
  if (ref_pos < 0) return false;
  *out_pos = ref_pos;
  return true;
}

// ---- write_MD_core (include/common/sam.hpp:249-287) ----
// MD letters via nt4: SEP(0) and N(5) both render/compare as N.
constexpr char MD_CHAR[6] = {'N', 'A', 'C', 'G', 'T', 'N'};

bool nt4_eq(int8_t a, int8_t b) {
  int ea = (a == 0 || a == 5) ? 4 : a;
  int eb = (b == 0 || b == 5) ? 4 : b;
  return ea == eb;
}

void write_md_core(const int8_t* tseq, const int8_t* qseq, const Cigar& ops,
                   std::string& md, int32_t* nm) {
  md.clear();
  int32_t l_md = 0, e_nm = 0;
  int64_t q = 0, t = 0;
  char buf[16];
  for (const auto& [op, len] : ops) {
    if (op == 0) {
      for (int32_t j = 0; j < len; ++j) {
        if (!nt4_eq(qseq[q + j], tseq[t + j])) {
          snprintf(buf, sizeof buf, "%d", l_md);
          md += buf;
          md += MD_CHAR[int(tseq[t + j])];
          l_md = 0;
          ++e_nm;
        } else {
          ++l_md;
        }
      }
      q += len;
      t += len;
    } else if (op == 1) {
      q += len;
      e_nm += len;
    } else {
      snprintf(buf, sizeof buf, "%d", l_md);
      md += buf;
      md += '^';
      for (int32_t j = 0; j < len; ++j) md += MD_CHAR[int(tseq[t + j])];
      l_md = 0;
      t += len;
      e_nm += len;
    }
  }
  if (l_md > 0) {
    snprintf(buf, sizeof buf, "%d", l_md);
    md += buf;
  }
  *nm = e_nm;
}

int64_t cigar_rlen(const Cigar& ops) {
  int64_t r = 0;
  for (const auto& [op, l] : ops)
    if (op == 0 || op == 2) r += l;
  return r;
}

// ---- chaining (oracle/chainer.py; chain.hpp:221-727) ----

int32_t ilog2_64(int64_t v) { return v > 0 ? 63 - __builtin_clzll(v) : 0; }

struct Anchor {
  int32_t mem_i, occ_i;
};

void sorted_anchors(const std::vector<Mem>& mems, std::vector<Anchor>& out,
                    int64_t* tot_mem_length) {
  out.clear();
  *tot_mem_length = 0;
  for (int32_t i = 0; i < (int32_t)mems.size(); ++i) {
    for (int32_t j = 0; j < (int32_t)mems[i].occs.size(); ++j)
      out.push_back({i, j});
    *tot_mem_length += int64_t(mems[i].len) * mems[i].occs.size();
  }
  std::stable_sort(out.begin(), out.end(),
                   [&](const Anchor& a, const Anchor& b) {
                     return mems[a.mem_i].occs[a.occ_i] + mems[a.mem_i].len <
                            mems[b.mem_i].occs[b.occ_i] + mems[b.mem_i].len;
                   });
}

struct DpState {
  std::vector<int64_t> f, f_sec;
  std::vector<int32_t> p, p_sec, t, t_sec;
  std::vector<int64_t> msc, msc_sec;
};

// The anchor sweep (chain.hpp:276-362; dual-lane :503-625).
void chain_dp(const std::vector<Mem>& mems, const std::vector<Anchor>& an,
              double avg, const SeParams& cfg, bool secondary, DpState& st) {
  int32_t N = (int32_t)an.size();
  st.f.assign(N, 0);
  st.p.assign(N, 0);
  st.msc.assign(N, 0);
  st.t.assign(N, 0);
  if (secondary) {
    st.f_sec.assign(N, 0);
    st.p_sec.assign(N, 0);
    st.msc_sec.assign(N, 0);
    st.t_sec.assign(N, 0);
  }
  int32_t lb = 0;
  for (int32_t i = 0; i < N; ++i) {
    const Mem& mi = mems[an[i].mem_i];
    int64_t x_i = mi.occs[an[i].occ_i] + mi.len - 1;
    int64_t y_i = mi.rpos;
    int64_t w_i = mi.len;
    int32_t mate_i = mi.mate;

    int64_t max_f = w_i, max_sec_f = w_i;
    int32_t max_j = -1, max_sec_j = -1;
    int32_t n_pred = 0;
    if (i - lb > cfg.max_iter) lb = i - cfg.max_iter;
    for (int32_t j = i - 1; j >= lb; --j) {
      const Mem& mj = mems[an[j].mem_i];
      int64_t x_j = mj.occs[an[j].occ_i] + mj.len - 1;
      int64_t y_j = mj.rpos;
      int32_t mate_j = mj.mate;

      if (mate_i != mate_j && (mate_i ^ mate_j) != 3) continue;
      if (x_i > x_j + cfg.max_dist_x) {
        lb = j;  // chain.hpp:318-322
        continue;
      }
      int64_t x_d = x_i - x_j;
      int64_t y_d = y_i - y_j;
      int64_t l = y_d > x_d ? y_d - x_d : x_d - y_d;
      int32_t ilog_l = l > 0 ? ilog2_64(l) : 0;
      if ((mate_i == mate_j && (y_j >= y_i || y_d > cfg.max_dist_y)) ||
          std::max(y_d, x_d) > cfg.G)
        continue;
      int64_t alpha = std::min(std::min(y_d, x_d), w_i);
      int64_t beta;
      if (mate_i != mate_j) {
        if (x_d == 0) {
          beta = 1;
        } else {
          int64_t c_lin = int64_t(double(l) * .01 * avg);
          beta = c_lin < ilog_l ? c_lin : ilog_l;
        }
      } else {
        // chain.hpp:332: ((ll)(.01*l*avg) + ilog_l) >> 1
        beta = l > 0 ? ((int64_t(.01 * double(l) * avg) + ilog_l) >> 1) : 0;
      }
      int64_t score = st.f[j] + (alpha - beta);
      if (score > max_f) {
        max_f = score;
        max_j = j;
        if (n_pred > 0) --n_pred;
      } else if (secondary && st.f_sec[j] + (alpha - beta) > max_sec_f) {
        // secondary lane: predecessor must not reuse an occurrence
        // position on the current primary chain (chain.hpp:592-612)
        if (max_j >= 0) {
          int64_t mem_j_pos = mj.occs[an[j].occ_i];
          bool uniq = true;
          for (int32_t tmp = max_j; tmp >= 0; tmp = st.p[tmp]) {
            if (mems[an[tmp].mem_i].occs[an[tmp].occ_i] == mem_j_pos) {
              uniq = false;
              break;
            }
          }
          if (uniq) {
            max_sec_f = st.f_sec[j] + (alpha - beta);
            max_sec_j = j;
          }
        }
      } else if (st.t[j] == i) {
        if (++n_pred > cfg.max_pred) break;
      }
      if (st.p[j] > 0) st.t[st.p[j]] = i;
      if (secondary && st.p_sec[j] > 0) st.t_sec[st.p_sec[j]] = i;
    }
    st.f[i] = max_f;
    st.p[i] = max_j;
    st.msc[i] =
        (max_j >= 0 && st.msc[max_j] > max_f) ? st.msc[max_j] : max_f;
    if (secondary) {
      st.f_sec[i] = max_sec_f;
      st.p_sec[i] = max_sec_j;
      st.msc_sec[i] = (max_sec_j >= 0 && st.msc_sec[max_sec_j] > max_sec_f)
                          ? st.msc_sec[max_sec_j]
                          : max_sec_f;
    }
  }
}

// chain.hpp:143-163 (peak walk)
void find_chain_starts(const std::vector<int32_t>& t,
                       const std::vector<int64_t>& f,
                       const std::vector<int32_t>& p,
                       const std::vector<int64_t>& msc, int32_t N,
                       int32_t min_chain_score,
                       std::vector<std::pair<int64_t, int32_t>>& starts) {
  starts.clear();
  for (int32_t i = 0; i < N; ++i) {
    if (t[i] == 0 && msc[i] > min_chain_score) {
      int32_t j = i;
      while (j >= 0 && f[j] < msc[j]) j = p[j];
      starts.push_back({j >= 0 ? f[j] : f[i], j});
    }
  }
}

// chain.hpp:166-200: shared-prefix splitting backtrack
void backtrack(const std::vector<std::pair<int64_t, int32_t>>& starts,
               const std::vector<int64_t>& f, const std::vector<int32_t>& p,
               const std::vector<Mem>& mems, const std::vector<Anchor>& an,
               int32_t N, const SeParams& cfg, std::vector<Chain>& chains) {
  std::vector<int32_t> t(N, 0);
  for (const auto& [start_f, j0] : starts) {
    int32_t j = j0;
    Chain chain;
    chain.score = start_f;
    chain.mate = mems[an[j].mem_i].mate;
    chain.paired = false;
    while (true) {
      chain.paired = chain.paired || (chain.mate != mems[an[j].mem_i].mate);
      chain.anchors.push_back(j);
      t[j] = 1;
      j = p[j];
      if (!(j >= 0 && t[j] == 0)) break;
    }
    if (j < 0) {
      if ((int32_t)chain.anchors.size() >= cfg.min_chain_length)
        chains.push_back(std::move(chain));
    } else if (start_f - f[j] >= cfg.min_chain_score) {
      if ((int32_t)chain.anchors.size() >= cfg.min_chain_length)
        chains.push_back(std::move(chain));
    }
  }
}

void find_chains(const std::vector<Mem>& mems, const SeParams& cfg,
                 bool secondary, std::vector<Anchor>& anchors,
                 std::vector<Chain>& chains, DpState& st) {
  chains.clear();
  int64_t tot_mem_length = 0;
  sorted_anchors(mems, anchors, &tot_mem_length);
  if (anchors.empty()) return;
  double avg = double(tot_mem_length) / anchors.size();
  int32_t N = (int32_t)anchors.size();
  chain_dp(mems, anchors, avg, cfg, secondary, st);

  std::vector<int32_t> t(N, 0);
  for (int32_t i = 0; i < N; ++i)
    if (st.p[i] >= 0) t[st.p[i]] = 1;
  std::vector<std::pair<int64_t, int32_t>> starts;
  find_chain_starts(t, st.f, st.p, st.msc, N, cfg.min_chain_score, starts);

  if (!secondary) {
    // std::sort greater<pair>: (score, anchor index) both descending
    std::stable_sort(starts.begin(), starts.end(),
                     [](const auto& a, const auto& b) {
                       return a.first != b.first ? a.first > b.first
                                                 : a.second > b.second;
                     });
    backtrack(starts, st.f, st.p, mems, anchors, N, cfg, chains);
  } else {
    if (starts.empty()) return;  // chain.hpp:653: primary count gates
    std::vector<int32_t> ts(N, 0);
    for (int32_t i = 0; i < N; ++i)
      if (st.p_sec[i] >= 0) ts[st.p_sec[i]] = 1;
    std::vector<std::pair<int64_t, int32_t>> starts_sec;
    find_chain_starts(ts, st.f_sec, st.p_sec, st.msc_sec, N,
                      cfg.min_chain_score, starts_sec);
    auto by_score = [](const auto& a, const auto& b) {
      return a.first > b.first;
    };
    std::stable_sort(starts.begin(), starts.end(), by_score);
    std::stable_sort(starts_sec.begin(), starts_sec.end(), by_score);
    backtrack(starts, st.f, st.p, mems, anchors, N, cfg, chains);
    backtrack(starts_sec, st.f_sec, st.p_sec, mems, anchors, N, cfg,
              chains);
  }
  std::stable_sort(chains.begin(), chains.end(),
                   [](const Chain& a, const Chain& b) {
                     return a.score > b.score;
                   });
}

// ---- fill_chain (oracle/fill.py; aligner_ksw2.hpp:2752-3196) ----

struct Scratch {
  std::vector<int32_t> H, F;
  std::vector<uint8_t> dirs;
  std::vector<uint32_t> cig;
  std::vector<int8_t> buf;  // reversed-context scratch
  DpState dp;
  std::vector<Anchor> anchors;
  std::vector<Chain> chains;
  std::vector<int32_t> genome_cnt, slotmap;
};

struct FillOut {
  int64_t score = 0;
  int64_t pos = 0;  // haplotype-coordinate start (0-based, global)
  bool unmapped_lft = false;
  bool finalized = false;
  Cigar lift_cig;  // haplotype-coordinate CIGAR (OA)
  std::string lift_md;
  int32_t lift_nm = 0;
  int64_t lift_pos = 0;
  int32_t lift_rlen = 0;
  Cigar cig;  // lifted (primary) CIGAR
  std::string md;
  int32_t nm = 0;
  int64_t out_pos = 0;  // lifted 0-based global position
  int32_t rlen = 0;
};

thread_local int64_t g_extz_calls = 0, g_extz_cells = 0;

// One extz call with scratch reuse; returns ops decoded when traceback.
ExtzOut run_extz(const Ctx& c, Scratch& s, const int8_t* q, int32_t qlen,
                 const int8_t* t, int32_t tlen, int32_t flags, Cigar* ops) {
  ++g_extz_calls;
  g_extz_cells += int64_t(qlen) * tlen;
  if (getenv("MONITPU_RT_DEBUG") && int64_t(qlen) * tlen > 1000000)
    fprintf(stderr,
            "[rt] big extz: qlen=%d tlen=%d flags=%d ext_len=%d n=%lld\n",
            qlen, tlen, flags, c.p->ext_len, (long long)c.n);
  ExtzOut out;
  int64_t cap = int64_t(qlen) + tlen + 4;
  uint32_t* cig = nullptr;
  if (!(flags & FLAG_SCORE_ONLY)) {
    if ((int64_t)s.cig.size() < cap) s.cig.resize(cap);
    cig = s.cig.data();
  }
  extz_lane(q, qlen, t, tlen, c.p->smatch, c.p->smismatch, c.p->gapo,
            c.p->gape, flags, s.H, s.F, s.dirs, cig, cap, &out);
  if (ops) {
    ops->clear();
    for (int32_t k = 0; k < out.n_cigar; ++k)
      ops->emplace_back(uint8_t(cig[k] & 0xf), int32_t(cig[k] >> 4));
  }
  return out;
}

// chain_anchors in FORWARD order. seq: strand-applied read codes, slen.
void fill_chain(const Ctx& c, Scratch& s, const std::vector<Mem>& mems,
                const std::vector<Anchor>& ca, const int8_t* seq,
                int32_t slen, bool score_only, FillOut* out) {
  const SeParams& p = *c.p;
  const int8_t* text = c.text;
  int64_t n = c.n;
  out->unmapped_lft = false;
  out->finalized = false;

  const Mem& m0 = mems[ca.front().mem_i];
  const Mem& mL = mems[ca.back().mem_i];
  int32_t lcs_len = m0.idx;  // left read context length
  int32_t rcs_off = mL.idx + mL.len;
  int32_t rcs_len = slen - rcs_off;

  int32_t flags = score_only ? FLAG_SCORE_ONLY : FLAG_EXTZ_ONLY;
  int64_t score_lc = 0, score_rc = 0;
  ExtzOut ez_lc{}, ez_rc{};
  Cigar lc_ops, rc_ops;
  bool have_lc = false, have_rc = false;

  int64_t mem_pos = m0.occs[ca.front().occ_i];
  if (lcs_len > 0) {
    int64_t lc_occ, lc_len;
    if (mem_pos > p.ext_len) {  // aligner_ksw2.hpp:2793-2795
      lc_occ = mem_pos - p.ext_len;
      lc_len = p.ext_len;
    } else {  // reference quirk: overlaps INTO the MEM
      lc_occ = 0;
      lc_len = p.ext_len - mem_pos;
    }
    lc_len = std::min(lc_len, n - lc_occ);
    // reversed left query context + reversed target context
    if ((int64_t)s.buf.size() < lcs_len + lc_len)
      s.buf.resize(lcs_len + lc_len);
    int8_t* lcs = s.buf.data();
    for (int32_t k = 0; k < lcs_len; ++k) lcs[k] = seq[lcs_len - 1 - k];
    int8_t* lc = s.buf.data() + lcs_len;
    for (int64_t k = 0; k < lc_len; ++k)
      lc[k] = text[lc_occ + lc_len - 1 - k];
    ez_lc = run_extz(c, s, lcs, lcs_len, lc, int32_t(lc_len), flags,
                     score_only ? nullptr : &lc_ops);
    score_lc = ez_lc.mqe;
    have_lc = true;
  }
  if (rcs_len > 0) {
    int64_t rc_occ = mL.occs[ca.back().occ_i] + mL.len;
    int64_t rc_len = rc_occ < n - p.ext_len ? p.ext_len : n - rc_occ;
    ez_rc = run_extz(c, s, seq + rcs_off, rcs_len, text + rc_occ,
                     int32_t(rc_len), flags, score_only ? nullptr : &rc_ops);
    score_rc = ez_rc.mqe;
    have_rc = true;
  }

  int64_t total = score_lc + score_rc;
  int64_t mem_span = mL.occs[ca.back().occ_i] + mL.len - mem_pos;
  int64_t lc_used = have_lc ? ez_lc.mqe_t + 1 : 0;
  int64_t rc_used = have_rc ? ez_rc.mqe_t + 1 : 0;
  int64_t ref_pos = lc_used > mem_pos ? 0 : mem_pos - lc_used;
  // raw length feeds valid() and lift_rlen (fill.py keeps it unclamped;
  // Python slicing clamps only the memory access)
  int64_t ref_len = lc_used + mem_span + rc_used;
  int64_t ref_len_clamped = std::min(ref_len, n - ref_pos);
  const int8_t* ref = text + ref_pos;
  out->pos = ref_pos;

  // overlap detection (aligner_ksw2.hpp:2895-2908)
  bool mems_overlap = false;
  {
    int64_t last_ref = mem_pos + m0.len;
    int64_t last_seq = m0.idx + m0.len;
    for (size_t k = 1; k < ca.size() && !mems_overlap; ++k) {
      const Mem& mk = mems[ca[k].mem_i];
      int64_t ref_occ = mk.occs[ca[k].occ_i];
      int64_t seq_occ = mk.idx;
      if (last_ref > ref_occ || last_seq > seq_occ) mems_overlap = true;
      last_ref = ref_occ + mk.len;
      last_seq = seq_occ + mk.len;
    }
  }

  std::vector<std::pair<int64_t, Cigar>> ez_cc;
  bool realign = mems_overlap;
  if (!realign) {
    int64_t last_ref = mem_pos + m0.len;
    int64_t last_seq = m0.idx + m0.len;
    for (size_t k = 1; k < ca.size(); ++k) {
      const Mem& mk = mems[ca[k].mem_i];
      int64_t ref_occ = mk.occs[ca[k].occ_i];
      int64_t seq_occ = mk.idx;
      if (last_ref == ref_occ) {
        if (last_seq < seq_occ) {
          int64_t l = seq_occ - last_seq;
          int64_t gsc = -std::min(p.gapo + l * p.gape, p.gapo2 + l * p.gape2);
          ez_cc.push_back({gsc, {{1, int32_t(l)}}});
        } else {
          ez_cc.push_back({0, {}});
        }
      } else if (last_seq == seq_occ) {
        // reference quirk: l from the READ gap == 0 -> "0D" op,
        // minimum gap-open cost (aligner_ksw2.hpp:2940)
        int64_t l = 0;
        int64_t gsc = -std::min(p.gapo + l * p.gape, p.gapo2 + l * p.gape2);
        ez_cc.push_back({gsc, {{2, 0}}});
      } else {
        const Mem& pm = mems[ca[k - 1].mem_i];
        int64_t cc_occ = pm.occs[ca[k - 1].occ_i] + pm.len;
        int64_t cc_len = ref_occ - cc_occ;
        cc_occ -= ref_pos;
        int64_t ccs_pos = pm.idx + pm.len;
        int64_t ccs_len = seq_occ - ccs_pos;
        // global, KSW_EZ_RIGHT; traceback only needed when finalizing
        Cigar gap_ops;
        ExtzOut ez = run_extz(c, s, seq + ccs_pos, int32_t(ccs_len),
                              ref + cc_occ, int32_t(cc_len),
                              score_only ? FLAG_SCORE_ONLY : 0,
                              score_only ? nullptr : &gap_ops);
        ez_cc.push_back({ez.score, std::move(gap_ops)});
      }
      const Mem& pm = mems[ca[k - 1].mem_i];
      total += int64_t(pm.len) * p.smatch + ez_cc.back().first;
      last_ref = ref_occ + mk.len;
      last_seq = seq_occ + mk.len;
    }
    total += int64_t(mL.len) * p.smatch;
  } else {
    ExtzOut ez = run_extz(c, s, seq, slen, ref, int32_t(ref_len_clamped),
                          FLAG_SCORE_ONLY, nullptr);
    total = ez.score;
  }

  bool is_valid = seq_valid(c, ref_pos, ref_len);
  if (!is_valid) total = NEG_INF;  // INT32_MIN (:2998)
  out->score = total;
  if (!(is_valid && !score_only)) return;

  // ---- finalize: CIGAR merge / realign traceback (:3000-3111) ----
  Cigar cigar;
  if (realign) {
    Cigar ops;
    ExtzOut ez =
        run_extz(c, s, seq, slen, ref, int32_t(ref_len_clamped), 0, &ops);
    cigar = std::move(ops);
    out->score = ez.score;
  } else {
    if (have_lc)
      for (auto it = lc_ops.rbegin(); it != lc_ops.rend(); ++it)
        cigar.push_back(*it);
    for (size_t k = 0; k < ca.size(); ++k) {
      cig_push(cigar, 0, mems[ca[k].mem_i].len);
      if (k + 1 < ca.size()) {
        const Cigar& gap_ops = ez_cc[k].second;
        if (!gap_ops.empty()) {
          if (gap_ops[0].first == 0)
            cigar.back().second += gap_ops[0].second;
          else
            cigar.push_back(gap_ops[0]);
          for (size_t g = 1; g < gap_ops.size(); ++g)
            cigar.push_back(gap_ops[g]);
        }
      }
    }
    if (have_rc && !rc_ops.empty()) {
      if (rc_ops[0].first == 0)
        cigar.back().second += rc_ops[0].second;
      else
        cigar.push_back(rc_ops[0]);
      for (size_t g = 1; g < rc_ops.size(); ++g) cigar.push_back(rc_ops[g]);
    }
  }

  out->finalized = true;
  out->lift_cig = cigar;
  write_md_core(ref, seq, cigar, out->lift_md, &out->lift_nm);
  out->lift_pos = ref_pos;
  out->lift_rlen = int32_t(ref_len);

  // liftover (:3133-3174)
  int64_t lpos = 0;
  Cigar lops;
  bool any = lift_cigar(c, ref_pos, cigar, &lpos, lops);
  int64_t lrlen = any ? cigar_rlen(lops) : 0;
  if (any && lrlen > 0) {
    write_md_core(text + lpos, seq, lops, out->md, &out->nm);
    out->out_pos = lpos;
    out->cig = std::move(lops);
    out->rlen = int32_t(lrlen);
  } else {  // aligned entirely inside an insertion (:3166-3172)
    out->unmapped_lft = true;
    out->out_pos = 0;
    out->cig.clear();
    out->rlen = 0;
  }
}

// chain_score (aligner_ksw2.hpp:2018-2098): score pass, then finalize
// pass when requested and the score clears min_score.
void chain_score(const Ctx& c, Scratch& s, const std::vector<Mem>& mems,
                 const std::vector<Anchor>& ca, const int8_t* seq,
                 int32_t slen, int64_t min_score, bool score_only,
                 FillOut* out) {
  fill_chain(c, s, mems, ca, seq, slen, true, out);
  if (!score_only && out->score >= min_score) {
    FillOut fin;
    fill_chain(c, s, mems, ca, seq, slen, false, &fin);
    int64_t sc = out->score;
    int64_t pos0 = out->pos;
    *out = std::move(fin);
    out->score = sc;  // callers use the score-only pass's score (:3161)
    out->pos = pos0;
  }
}

// ---- per-read SE pipeline (oracle/se.py align_se) ----

// Packed seed layout (ops/occs.pack_seeds): one record per valid seed,
// sorted by (row, slot) where row in [0, 2B) = fwd/rc lane x read; a
// flat occurrence pool indexed by off/cnt.
struct SeedArrays {
  const int32_t* row;   // [n_seeds] sorted ascending
  const int32_t* slot;
  const int32_t* len;
  const int32_t* idx;
  const int32_t* cnt;
  const int32_t* off;
  const int32_t* occ;   // flat pool
  int64_t n_seeds;
  int64_t S, K;         // slots per lane, parent slots (S == 3K)
  std::vector<int64_t> rowstart;  // [2B + 1]
};

// Build the oracle-ordered mem list for read b: fwd parents, rc
// parents, then (left, right) halves per parent in that order. Applies
// the per-genome n_seeds_thr occurrence filter (seed_finder.hpp:187-193)
// over each seed's occ stream (occ[0] = walk start, never filtered).
void build_mems(const Ctx& c, const SeedArrays& sd, int64_t B, int64_t b,
                std::vector<Mem>& mems, std::vector<int32_t>& genome_cnt,
                std::vector<int32_t>& slotmap) {
  mems.clear();
  const SeParams& p = *c.p;
  // lane-local slot -> packed record index (-1 = absent)
  slotmap.assign(2 * sd.S, -1);
  for (int lane = 0; lane < 2; ++lane) {
    int64_t r = lane == 0 ? b : B + b;
    for (int64_t k = sd.rowstart[r]; k < sd.rowstart[r + 1]; ++k)
      slotmap[lane * sd.S + sd.slot[k]] = int32_t(k);
  }
  struct Parent {
    int lane;
    int32_t slot;
  };
  std::vector<Parent> parents;
  auto add_seed = [&](int lane, int64_t slot, int32_t mate) {
    int32_t k = slotmap[lane * sd.S + slot];
    if (k < 0) return false;
    Mem m;
    m.len = sd.len[k];
    m.idx = sd.idx[k];
    m.mate = mate;
    m.rpos = int64_t(m.idx) + m.len - 1;
    int32_t cnt = sd.cnt[k];
    const int32_t* o = sd.occ + sd.off[k];
    if (cnt <= 0) return false;
    m.pos = o[0];
    if (p.filter_seeds) {
      genome_cnt.assign(c.nseq, 0);
      for (int32_t j = 0; j < cnt; ++j) {
        int32_t g = seq_of(c, o[j]);
        if (j > 0 && ++genome_cnt[g] > p.n_seeds_thr) continue;
        if (j == 0) ++genome_cnt[g];
        m.occs.push_back(o[j]);
      }
    } else {
      m.occs.assign(o, o + cnt);
    }
    if (m.occs.empty()) return false;
    mems.push_back(std::move(m));
    return true;
  };
  // fwd parents (lane 0), then rc parents (lane 1)
  for (int lane = 0; lane < 2; ++lane)
    for (int64_t i = 0; i < sd.K; ++i)
      if (add_seed(lane, i, lane ? 2 : 0))
        parents.push_back({lane, int32_t(i)});
  // halves: slots [K, 2K) = left, [2K, 3K) = right of parent slot i
  for (const Parent& pa : parents) {
    int32_t mate = pa.lane ? 2 : 0;
    add_seed(pa.lane, sd.K + pa.slot, mate);
    add_seed(pa.lane, 2 * sd.K + pa.slot, mate);
  }
}

// aligner_ksw2.hpp:1905-1933
void seed_freq_filter(std::vector<Mem>& mems, double freq_thr) {
  int64_t total = 0;
  for (const Mem& m : mems) total += m.occs.size();
  if (total == 0) return;
  std::vector<Mem> keep;
  keep.reserve(mems.size());
  for (Mem& m : mems)
    if (double(m.occs.size()) / double(total) <= freq_thr)
      keep.push_back(std::move(m));
  mems.swap(keep);
}

struct SeOut {
  int32_t* flag;
  int32_t* rname;
  int64_t* pos;  // 1-based within rname
  int32_t* asc;
  int32_t* zs;
  int32_t* nm;
  int32_t* rlen;
  uint32_t* cigar;
  int32_t* ncigar;
  char* md;
  int32_t* lift_rname;
  int64_t* lift_pos;
  uint32_t* lift_cigar;
  int32_t* lift_ncigar;
  char* lift_md;
  int32_t* lift_nm;
  int32_t* lift_rlen;
  uint8_t* unmapped_lft;
  int32_t* alt_rname;
  int64_t* alt_pos;
  int32_t* alt_score;
  int32_t* nalt;
  int32_t* chains_skipped;
};

void emit_cigar(const Cigar& ops, uint32_t* out, int32_t* n, int32_t cap) {
  int32_t k = 0;
  for (const auto& [op, l] : ops) {
    if (k >= cap) break;
    out[k++] = (uint32_t(l) << 4) | op;
  }
  *n = k;
}

void emit_str(const std::string& sv, char* out, int32_t cap) {
  int32_t l = std::min<int32_t>(int32_t(sv.size()), cap - 1);
  memcpy(out, sv.data(), l);
  out[l] = 0;
}

void align_one(const Ctx& c, Scratch& s, const SeedArrays& sd,
               const int8_t* fwd, const int8_t* rcv, int32_t slen,
               int64_t B, int64_t b, const SeOut& o) {
  const SeParams& p = *c.p;
  auto set_unmapped = [&] {
    o.flag[b] = 4;
    o.rname[b] = -1;
    o.pos[b] = 0;
    o.ncigar[b] = 0;
    o.lift_ncigar[b] = 0;
    o.md[b * p.md_cap] = 0;
    o.lift_md[b * p.md_cap] = 0;
    o.nalt[b] = 0;
  };
  o.chains_skipped[b] = 0;
  o.unmapped_lft[b] = 0;

  std::vector<Mem> mems;
  build_mems(c, sd, B, b, mems, s.genome_cnt, s.slotmap);
  if (p.filter_freq) seed_freq_filter(mems, p.freq_thr);

  find_chains(mems, p, p.secondary != 0, s.anchors, s.chains, s.dp);
  const std::vector<Anchor>& anchors = s.anchors;
  const std::vector<Chain>& chains = s.chains;
  if (chains.empty()) {
    set_unmapped();
    return;
  }

  int64_t min_score = int64_t(20 + 8 * std::log(double(slen)));

  // selection (aligner_ksw2.hpp:394-483 + check_left_MEM :553-597)
  struct Best {
    int64_t score, lft;
    int32_t idx;
  };
  std::vector<Best> best_scores;
  std::vector<int64_t> different_scores;
  auto seen_score = [&](int64_t sc) {
    for (int64_t v : different_scores)
      if (v == sc) return true;
    return false;
  };
  std::vector<std::pair<int64_t, int64_t>> left_mem_vec;  // (ref pos, score)
  int64_t max_score = 0;
  int32_t nalt = 0;
  std::vector<Anchor> fwd_anchors;

  int32_t i = 0;
  while (i < (int32_t)chains.size() &&
         (int32_t)different_scores.size() < p.check_k) {
    if (!seen_score(chains[i].score))
      different_scores.push_back(chains[i].score);
    if (p.left_mem_check) {
      // check_left_MEM (aligner_ksw2.hpp:553-597)
      const Chain& ch = chains[i];
      int32_t a0 = ch.anchors.back();  // leftmost anchor
      int64_t left_pos =
          mems[anchors[a0].mem_i].occs[anchors[a0].occ_i];
      int64_t lifted = lift_pos(c, left_pos);
      int64_t off = lifted - c.seq_starts[seq_of(c, lifted)];
      int64_t left_ref_pos = off + 1;
      bool skip = false;
      for (const auto& [pos_j, score_j] : left_mem_vec) {
        if (std::llabs(pos_j - left_ref_pos) < p.region_dist &&
            score_j == ch.score) {
          skip = true;
          break;
        }
      }
      if (skip) {
        ++o.chains_skipped[b];
        ++i;
        continue;
      }
      left_mem_vec.push_back({left_ref_pos, ch.score});
    }
    if ((int32_t)different_scores.size() < p.check_k) {
      const Chain& ch = chains[i];
      fwd_anchors.clear();
      for (auto it = ch.anchors.rbegin(); it != ch.anchors.rend(); ++it)
        fwd_anchors.push_back(anchors[*it]);
      const int8_t* read = (ch.mate & 2) ? rcv : fwd;
      FillOut fo;
      chain_score(c, s, mems, fwd_anchors, read, slen, min_score, true,
                  &fo);
      int64_t lft = lift_pos(c, fo.pos);
      // check_max_score (aligner_ksw2.hpp:525-548)
      if (fo.score > max_score) {
        max_score = fo.score;
        nalt = 0;
      } else if (fo.score == max_score) {
        if (nalt < p.alt_cap) {
          int32_t sq = seq_of(c, fo.pos);
          o.alt_rname[b * p.alt_cap + nalt] = sq;
          o.alt_pos[b * p.alt_cap + nalt] =
              fo.pos - c.seq_starts[sq] + 1;
          o.alt_score[b * p.alt_cap + nalt] = int32_t(fo.score);
          ++nalt;
        }
      }
      bool replaced = false;
      int32_t j = 0;
      while (j < (int32_t)best_scores.size()) {
        if (std::llabs(best_scores[j].lft - lft) < p.region_dist) {
          if (fo.score > best_scores[j].score) {
            if (replaced) {
              best_scores[j] = {0, 0, i - 1};
            } else {
              best_scores[j] = {fo.score, lft, i};
              ++i;
              replaced = true;
            }
          } else {
            j = (int32_t)best_scores.size();
            replaced = true;
            ++i;
          }
        }
        ++j;
      }
      if (!replaced) {
        best_scores.push_back({fo.score, lft, i});
        ++i;
      }
    }
  }
  o.nalt[b] = nalt;

  while ((int32_t)best_scores.size() < 2)
    best_scores.push_back({0, 0, (int32_t)chains.size()});
  std::stable_sort(best_scores.begin(), best_scores.end(),
                   [](const Best& a, const Best& b) {
                     if (a.score != b.score) return a.score > b.score;
                     if (a.lft != b.lft) return a.lft > b.lft;
                     return a.idx > b.idx;
                   });

  if (best_scores[0].score < min_score) {
    int32_t keep_alt = o.nalt[b];
    set_unmapped();
    o.nalt[b] = keep_alt;  // AA bookkeeping survives (rec fields set)
    return;
  }

  int64_t score2 = best_scores[1].score;
  const Chain& ch = chains[best_scores[0].idx];
  fwd_anchors.clear();
  for (auto it = ch.anchors.rbegin(); it != ch.anchors.rend(); ++it)
    fwd_anchors.push_back(anchors[*it]);
  bool strand = (ch.mate & 2) != 0;
  const int8_t* read = strand ? rcv : fwd;
  FillOut fin;
  chain_score(c, s, mems, fwd_anchors, read, slen, min_score, false, &fin);
  if (fin.score < min_score || !fin.finalized) {
    int32_t keep_alt = o.nalt[b];
    set_unmapped();
    o.nalt[b] = keep_alt;
    return;
  }

  o.flag[b] = strand ? 16 : 0;
  o.zs[b] = int32_t(score2);
  o.asc[b] = int32_t(fin.score);
  // OA (haplotype-coordinate) fields (:3125-3131)
  int32_t lsq = seq_of(c, fin.lift_pos);
  o.lift_rname[b] = lsq;
  o.lift_pos[b] = fin.lift_pos - c.seq_starts[lsq] + 1;
  emit_cigar(fin.lift_cig, o.lift_cigar + b * p.cigar_cap,
             &o.lift_ncigar[b], p.cigar_cap);
  emit_str(fin.lift_md, o.lift_md + b * p.md_cap, p.md_cap);
  o.lift_nm[b] = fin.lift_nm;
  o.lift_rlen[b] = fin.lift_rlen;
  if (fin.unmapped_lft) {
    o.unmapped_lft[b] = 1;
    o.rname[b] = -1;
    o.pos[b] = 0;
    o.ncigar[b] = 0;
    o.md[b * p.md_cap] = 0;
    o.nm[b] = 0;
    o.rlen[b] = 0;
  } else {
    int32_t sq = seq_of(c, fin.out_pos);
    o.rname[b] = sq;
    o.pos[b] = fin.out_pos - c.seq_starts[sq] + 1;
    emit_cigar(fin.cig, o.cigar + b * p.cigar_cap, &o.ncigar[b],
               p.cigar_cap);
    emit_str(fin.md, o.md + b * p.md_cap, p.md_cap);
    o.nm[b] = fin.nm;
    o.rlen[b] = fin.rlen;
  }
}

}  // namespace

extern "C" {

int monitpu_postseed_se(
    const int8_t* text, int64_t n, const int64_t* seq_starts, int32_t nseq,
    const int64_t* lift_hs, const int64_t* lift_rs, const uint8_t* lift_ins,
    const int64_t* lift_se, int64_t n_lift, const int8_t* fwd,
    const int8_t* rcv, const int32_t* lens, int64_t B, int64_t M,
    const int32_t* s_row, const int32_t* s_slot, const int32_t* s_len,
    const int32_t* s_idx, const int32_t* s_cnt, const int32_t* s_off,
    const int32_t* s_occ, int64_t n_seeds, int64_t S, int64_t K,
    const SeParams* prm, int32_t* o_flag, int32_t* o_rname,
    int64_t* o_pos, int32_t* o_as, int32_t* o_zs, int32_t* o_nm,
    int32_t* o_rlen, uint32_t* o_cigar, int32_t* o_ncigar, char* o_md,
    int32_t* o_lift_rname, int64_t* o_lift_pos, uint32_t* o_lift_cigar,
    int32_t* o_lift_ncigar, char* o_lift_md, int32_t* o_lift_nm,
    int32_t* o_lift_rlen, uint8_t* o_unmapped_lft, int32_t* o_alt_rname,
    int64_t* o_alt_pos, int32_t* o_alt_score, int32_t* o_nalt,
    int32_t* o_chains_skipped) {
  Ctx c{text,    n,       seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, prm};
  SeedArrays sd{s_row, s_slot, s_len, s_idx, s_cnt, s_off, s_occ,
                n_seeds, S, K, {}};
  // per-row record ranges (rows arrive sorted ascending)
  sd.rowstart.assign(2 * B + 2, 0);
  for (int64_t k = 0; k < n_seeds; ++k) {
    int64_t r = s_row[k];
    if (r >= 0 && r < 2 * B) ++sd.rowstart[r + 1];
  }
  for (int64_t r = 0; r < 2 * B + 1; ++r)
    sd.rowstart[r + 1] += sd.rowstart[r];
  SeOut out{o_flag,       o_rname,       o_pos,        o_as,
            o_zs,         o_nm,          o_rlen,       o_cigar,
            o_ncigar,     o_md,          o_lift_rname, o_lift_pos,
            o_lift_cigar, o_lift_ncigar, o_lift_md,    o_lift_nm,
            o_lift_rlen,  o_unmapped_lft, o_alt_rname, o_alt_pos,
            o_alt_score,  o_nalt,        o_chains_skipped};
  int32_t n_threads = std::max(1, prm->n_threads);
  const bool dbg = getenv("MONITPU_RT_DEBUG") != nullptr;
  auto work = [&](int64_t lo, int64_t hi) {
    Scratch s;
    for (int64_t b = lo; b < hi; ++b) {
      if (dbg) {
        g_extz_calls = g_extz_cells = 0;
        auto t0 = std::chrono::steady_clock::now();
        align_one(c, s, sd, fwd + b * M, rcv + b * M, lens[b], B, b, out);
        double dt = std::chrono::duration<double>(
                        std::chrono::steady_clock::now() - t0).count();
        if (dt > 0.05)
          fprintf(stderr,
                  "[rt] read %lld: %.3fs extz_calls=%lld cells=%lld\n",
                  (long long)b, dt, (long long)g_extz_calls,
                  (long long)g_extz_cells);
      } else {
        align_one(c, s, sd, fwd + b * M, rcv + b * M, lens[b], B, b, out);
      }
    }
  };
  if (n_threads == 1 || B <= 1) {
    work(0, B);
  } else {
    std::vector<std::thread> pool;
    int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(B, lo + chunk);
      if (lo >= hi) break;
      pool.emplace_back(work, lo, hi);
    }
    for (auto& t : pool) t.join();
  }
  return 0;
}

}  // extern "C"
