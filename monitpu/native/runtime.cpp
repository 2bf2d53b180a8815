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

#include <atomic>

// ---- opt-in phase accounting (the MTIME analog for the native side;
// include/common/common.hpp:468-525). Zero-cost when off; enabled via
// monitpu_prof_reset(1) from tools/profile_postseed.py.
// Counters are individually atomic but not snapshotted as a set:
// call reset/read only while no postseed call is in flight, or the
// snapshot may mix batches (fine for the profiling tool, which runs
// the pipeline synchronously). ----
namespace {
struct NativeProf {
  std::atomic<int64_t> build_ns{0}, chain_ns{0}, select_ns{0},
      resolve_ns{0}, mems_n{0}, anchors_n{0}, chains_n{0}, jobs_n{0};
  std::atomic<bool> on{false};
};
NativeProf g_prof;
inline int64_t prof_now() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}
}  // namespace

extern "C" void monitpu_prof_reset(int enable) {
  g_prof.on.store(enable != 0);
  g_prof.build_ns = 0;
  g_prof.chain_ns = 0;
  g_prof.select_ns = 0;
  g_prof.resolve_ns = 0;
  g_prof.mems_n = 0;
  g_prof.anchors_n = 0;
  g_prof.chains_n = 0;
  g_prof.jobs_n = 0;
}

extern "C" void monitpu_prof_read(int64_t* out8) {
  out8[0] = g_prof.build_ns.load();
  out8[1] = g_prof.chain_ns.load();
  out8[2] = g_prof.select_ns.load();
  out8[3] = g_prof.resolve_ns.load();
  out8[4] = g_prof.mems_n.load();
  out8[5] = g_prof.anchors_n.load();
  out8[6] = g_prof.chains_n.load();
  out8[7] = g_prof.jobs_n.load();
}

namespace {

using monitpu::ExtzOut;
using monitpu::extz_lane;
using monitpu::nscore;
using monitpu::FLAG_SCORE_ONLY;
using monitpu::FLAG_EXTZ_ONLY;
using monitpu::NEED_MQE;
using monitpu::NEED_CORNER;
using monitpu::extz_lane_banded;

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

// Device extz score-pass plumbing (the score_only/finalize split of
// aligner_ksw2.hpp:2068-2075 with the score pass on the TPU):
// PLAN replays the selection loop with dummy scores, RECORDING every
// score-only extz call as a job descriptor — the SET of score-pass
// calls is score-independent (chain order is fixed by chain-DP scores
// and check_left_MEM positions only). RESOLVE replays the same loop
// consuming the device-computed (mqe, mqe_t, corner) in recording
// order, then runs host traceback for the winner only. Overlap-realign
// chains compute lc/rc host-side in BOTH passes (their realign window
// depends on lc/rc mqe_t, which PLAN would not have yet).
struct ExtzJob {
  int32_t qrow, qoff, qlen, qrev;
  int64_t tpos;
  int32_t tlen, trev;
};

enum { MODE_HOST = 0, MODE_PLAN = 1, MODE_RESOLVE = 2 };

struct Broker {
  int mode = MODE_HOST;
  std::vector<ExtzJob>* rec = nullptr;  // PLAN: current read's jobs
  const ExtzJob* jobs = nullptr;        // RESOLVE: global job array
  const int32_t *mqe = nullptr, *mqe_t = nullptr, *corner = nullptr;
  int64_t cursor = 0, end = 0;
  int32_t q_cap = 0, t_cap = 0;
  int32_t cur_qrow = 0;  // device lane row of the current chain's read
  int64_t mismatch = 0, host_jobs = 0;

  bool dev_ok(int64_t ql, int64_t tl) const {
    return mode != MODE_HOST && ql >= 1 && tl >= 1 && ql <= q_cap &&
           tl <= t_cap;
  }
  // returns (mqe, mqe_t, corner) for a recorded/consumed job
  void take(int32_t qoff, int32_t qlen, int32_t qrev, int64_t tpos,
            int32_t tlen, int32_t trev, int32_t* o_mqe, int32_t* o_mqt,
            int32_t* o_cor) {
    if (mode == MODE_PLAN) {
      rec->push_back({cur_qrow, qoff, qlen, qrev, tpos, tlen, trev});
      *o_mqe = 0;
      *o_mqt = -1;
      *o_cor = 0;
      return;
    }
    if (cursor >= end) {
      ++mismatch;
      *o_mqe = 0;
      *o_mqt = -1;
      *o_cor = 0;
      return;
    }
    const ExtzJob& j = jobs[cursor];
    if (j.qrow != cur_qrow || j.qlen != qlen || j.tlen != tlen ||
        j.qoff != qoff || j.tpos != tpos) {
      ++mismatch;
    }
    *o_mqe = mqe[cursor];
    *o_mqt = mqe_t[cursor];
    *o_cor = corner[cursor];
    ++cursor;
  }
};

struct Scratch {
  std::vector<int32_t> H, F;
  std::vector<uint8_t> dirs;
  std::vector<uint32_t> cig;
  std::vector<int8_t> buf;  // reversed-context scratch
  DpState dp;
  std::vector<Anchor> anchors;
  std::vector<Chain> chains;
  std::vector<Mem> mems;
  // per-genome occurrence counter with epoch stamps: cleared in O(1)
  // per seed instead of O(nseq) (matters on many-haplotype pangenomes)
  std::vector<int32_t> genome_cnt, genome_epoch, slotmap;
  int32_t epoch = 0;
  Broker bk;
};


struct FillOut {
  int64_t score = 0;
  int64_t pos = 0;  // haplotype-coordinate start (0-based, global)
  int64_t asc = 0;  // SAM AS value (finalize-pass total / orphan extz)
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
const bool g_rt_debug = getenv("MONITPU_RT_DEBUG") != nullptr;

// One extz call with scratch reuse; returns ops decoded when traceback.
// `need` (NEED_MQE / NEED_CORNER) names the output fields the caller
// consumes: the banded DP certifies exactly those (and the traceback)
// before skipping out-of-band cells — see extz_lane_banded.
ExtzOut run_extz(const Ctx& c, Scratch& s, const int8_t* q, int32_t qlen,
                 const int8_t* t, int32_t tlen, int32_t flags, Cigar* ops,
                 int32_t need) {
  ++g_extz_calls;
  g_extz_cells += int64_t(qlen) * tlen;
  if (g_rt_debug && int64_t(qlen) * tlen > 1000000)
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
  extz_lane_banded(q, qlen, t, tlen, c.p->smatch, c.p->smismatch, c.p->gapo,
                   c.p->gape, flags, need, 12, s.H, s.F, s.dirs, cig, cap,
                   &out);
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

  // overlap detection (aligner_ksw2.hpp:2895-2908) — hoisted above the
  // context extensions so the device broker can keep overlap-realign
  // chains' lc/rc host-side in both the PLAN and RESOLVE passes
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
  const bool brokered = score_only && s.bk.mode != MODE_HOST;

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
    if (brokered && !mems_overlap && s.bk.dev_ok(lcs_len, lc_len)) {
      int32_t cor;
      s.bk.take(lcs_len - 1, lcs_len, 1, lc_occ, int32_t(lc_len), 1,
                &ez_lc.mqe, &ez_lc.mqe_t, &cor);
      score_lc = ez_lc.mqe;
      have_lc = true;
    } else {
      if (brokered) ++s.bk.host_jobs;
      // reversed left query context + reversed target context
      if ((int64_t)s.buf.size() < lcs_len + lc_len)
        s.buf.resize(lcs_len + lc_len);
      int8_t* lcs = s.buf.data();
      for (int32_t k = 0; k < lcs_len; ++k) lcs[k] = seq[lcs_len - 1 - k];
      int8_t* lc = s.buf.data() + lcs_len;
      for (int64_t k = 0; k < lc_len; ++k)
        lc[k] = text[lc_occ + lc_len - 1 - k];
      ez_lc = run_extz(c, s, lcs, lcs_len, lc, int32_t(lc_len), flags,
                       score_only ? nullptr : &lc_ops, NEED_MQE);
      score_lc = ez_lc.mqe;
      have_lc = true;
    }
  }
  if (rcs_len > 0) {
    int64_t rc_occ = mL.occs[ca.back().occ_i] + mL.len;
    int64_t rc_len = rc_occ < n - p.ext_len ? p.ext_len : n - rc_occ;
    if (brokered && !mems_overlap && s.bk.dev_ok(rcs_len, rc_len)) {
      int32_t cor;
      s.bk.take(rcs_off, rcs_len, 0, rc_occ, int32_t(rc_len), 0,
                &ez_rc.mqe, &ez_rc.mqe_t, &cor);
      score_rc = ez_rc.mqe;
      have_rc = true;
    } else {
      if (brokered) ++s.bk.host_jobs;
      ez_rc = run_extz(c, s, seq + rcs_off, rcs_len, text + rc_occ,
                       int32_t(rc_len), flags,
                       score_only ? nullptr : &rc_ops, NEED_MQE);
      score_rc = ez_rc.mqe;
      have_rc = true;
    }
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
        int64_t cc_abs = pm.occs[ca[k - 1].occ_i] + pm.len;
        int64_t cc_len = ref_occ - cc_abs;
        int64_t cc_occ = cc_abs - ref_pos;
        int64_t ccs_pos = pm.idx + pm.len;
        int64_t ccs_len = seq_occ - ccs_pos;
        if (brokered && s.bk.dev_ok(ccs_len, cc_len)) {
          int32_t gm, gt, gcor;
          s.bk.take(int32_t(ccs_pos), int32_t(ccs_len), 0, cc_abs,
                    int32_t(cc_len), 0, &gm, &gt, &gcor);
          ez_cc.push_back({gcor, {}});
        } else {
          if (brokered) ++s.bk.host_jobs;
          // global, KSW_EZ_RIGHT; traceback only when finalizing
          Cigar gap_ops;
          ExtzOut ez = run_extz(c, s, seq + ccs_pos, int32_t(ccs_len),
                                ref + cc_occ, int32_t(cc_len),
                                score_only ? FLAG_SCORE_ONLY : 0,
                                score_only ? nullptr : &gap_ops,
                                NEED_CORNER);
          ez_cc.push_back({ez.score, std::move(gap_ops)});
        }
      }
      const Mem& pm = mems[ca[k - 1].mem_i];
      total += int64_t(pm.len) * p.smatch + ez_cc.back().first;
      last_ref = ref_occ + mk.len;
      last_seq = seq_occ + mk.len;
    }
    total += int64_t(mL.len) * p.smatch;
  } else if (brokered && s.bk.dev_ok(slen, ref_len_clamped)) {
    // whole-chain realign: lc/rc above ran host-side (both passes), so
    // ref_pos/ref_len_clamped are identical in PLAN and RESOLVE
    int32_t rm, rt, rcor;
    s.bk.take(0, slen, 0, ref_pos, int32_t(ref_len_clamped), 0, &rm, &rt,
              &rcor);
    total = rcor;
  } else {
    if (brokered) ++s.bk.host_jobs;
    ExtzOut ez = run_extz(c, s, seq, slen, ref, int32_t(ref_len_clamped),
                          FLAG_SCORE_ONLY, nullptr, NEED_CORNER);
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
    ExtzOut ez = run_extz(c, s, seq, slen, ref,
                          int32_t(ref_len_clamped), 0, &ops, NEED_CORNER);
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
  out->asc = out->score;  // AS = recomputed finalize total (fill.py 'as')
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
    *out = std::move(fin);
    out->score = sc;  // callers use the score-only pass's score (:3161)
    // the finalize dict's 'pos' is the LIFTED position, or 0 when the
    // alignment lifts entirely into an insertion (fill.py:277/284) —
    // PE dist/tot and the lft dedup keys are computed from it
    out->pos = out->unmapped_lft ? 0 : out->out_pos;
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
  const int64_t* occ;   // flat pool (int64: n may exceed 2^31)
  int64_t n_seeds;
  int64_t S, K;         // slots per lane, parent slots (S == 3K)
  std::vector<int64_t> rowstart;  // [n_rows + 1]
  std::vector<int32_t> order;     // record ids bucketed by row
};

// counting-sort records into per-row buckets (input order arbitrary —
// sharded seed stages emit shard-interleaved rows)
void bucket_rows(SeedArrays& sd, int64_t n_rows) {
  sd.rowstart.assign(n_rows + 2, 0);
  for (int64_t k = 0; k < sd.n_seeds; ++k) {
    int64_t r = sd.row[k];
    if (r >= 0 && r < n_rows) ++sd.rowstart[r + 1];
  }
  for (int64_t r = 0; r < n_rows + 1; ++r)
    sd.rowstart[r + 1] += sd.rowstart[r];
  sd.order.resize(sd.rowstart[n_rows]);
  std::vector<int64_t> cur(sd.rowstart.begin(), sd.rowstart.end() - 1);
  for (int64_t k = 0; k < sd.n_seeds; ++k) {
    int64_t r = sd.row[k];
    if (r >= 0 && r < n_rows) sd.order[cur[r]++] = int32_t(k);
  }
}
// shared seed-record extraction + per-genome n_seeds_thr filter
// (seed_finder.hpp:187-193; occ[0] = walk start, never filtered) used
// by both the SE and PE mem builders
bool extract_seed(const Ctx& c, const SeedArrays& sd, Scratch& s,
                  int32_t k, int32_t mate, int64_t rpos_off, Mem* m) {
  const SeParams& p = *c.p;
  m->len = sd.len[k];
  m->idx = sd.idx[k];
  m->mate = mate;
  m->rpos = rpos_off + m->idx + m->len - 1;
  m->occs.clear();
  int32_t cnt = sd.cnt[k];
  const int64_t* o = sd.occ + sd.off[k];
  if (cnt <= 0) return false;
  m->pos = o[0];
  if (p.filter_seeds) {
    if ((size_t)c.nseq > s.genome_cnt.size()) {
      s.genome_cnt.assign(c.nseq, 0);
      s.genome_epoch.assign(c.nseq, -1);
    }
    int32_t e = s.epoch++;
    auto bump = [&](int32_t g) {
      if (s.genome_epoch[g] != e) {
        s.genome_epoch[g] = e;
        s.genome_cnt[g] = 0;
      }
      return ++s.genome_cnt[g];
    };
    for (int32_t j = 0; j < cnt; ++j) {
      int32_t g = seq_of(c, o[j]);
      if (j > 0 && bump(g) > p.n_seeds_thr) continue;
      if (j == 0) bump(g);
      m->occs.push_back(o[j]);
    }
  } else {
    m->occs.assign(o, o + cnt);
  }
  return !m->occs.empty();
}

// Build the oracle-ordered mem list for read b: fwd parents, rc
// parents, then (left, right) halves per parent in that order. Applies
// the per-genome n_seeds_thr occurrence filter (seed_finder.hpp:187-193)
// over each seed's occ stream (occ[0] = walk start, never filtered).
void build_mems(const Ctx& c, const SeedArrays& sd, Scratch& s,
                int64_t B, int64_t b, std::vector<Mem>& mems) {
  mems.clear();
  // lane-local slot -> packed record index (-1 = absent)
  s.slotmap.assign(2 * sd.S, -1);
  for (int lane = 0; lane < 2; ++lane) {
    int64_t r = lane == 0 ? b : B + b;
    for (int64_t q = sd.rowstart[r]; q < sd.rowstart[r + 1]; ++q) {
      int32_t k = sd.order[q];
      s.slotmap[lane * sd.S + sd.slot[k]] = k;
    }
  }
  struct Parent {
    int lane;
    int32_t slot;
  };
  std::vector<Parent> parents;
  Mem m;
  auto add_seed = [&](int lane, int64_t slot, int32_t mate) {
    int32_t k = s.slotmap[lane * sd.S + slot];
    if (k < 0 || !extract_seed(c, sd, s, k, mate, 0, &m)) return false;
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

// per-read state kept between the PLAN and RESOLVE passes
struct ReadPlan {
  std::vector<Mem> mems;
  std::vector<Anchor> anchors;
  std::vector<Chain> chains;
  std::vector<ExtzJob> jobs;
  int64_t job_off = 0;
};

struct SeHandle {
  std::vector<ReadPlan> plans;
  std::vector<ExtzJob> alljobs;
  int32_t q_cap = 0, t_cap = 0;  // resolve must replay plan's decisions
};

void align_one(const Ctx& c, Scratch& s, const SeedArrays& sd,
               const int8_t* fwd, const int8_t* rcv, int32_t slen,
               int64_t B, int64_t b, const SeOut& o, int mode = MODE_HOST,
               ReadPlan* plan = nullptr) {
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
  if (mode != MODE_PLAN) {
    o.chains_skipped[b] = 0;
    o.unmapped_lft[b] = 0;
  }

  const std::vector<Mem>* memsp;
  const std::vector<Anchor>* anchorsp;
  const std::vector<Chain>* chainsp;
  if (mode == MODE_RESOLVE) {
    memsp = &plan->mems;
    anchorsp = &plan->anchors;
    chainsp = &plan->chains;
    s.bk.mode = MODE_RESOLVE;
    s.bk.cursor = plan->job_off;
    s.bk.end = plan->job_off + (int64_t)plan->jobs.size();
  } else {
    const bool prof = g_prof.on.load(std::memory_order_relaxed);
    int64_t t0 = prof ? prof_now() : 0;
    s.mems.clear();
    build_mems(c, sd, s, B, b, s.mems);
    if (p.filter_freq) seed_freq_filter(s.mems, p.freq_thr);
    if (prof) {
      int64_t t1 = prof_now();
      g_prof.build_ns += t1 - t0;
      g_prof.mems_n += (int64_t)s.mems.size();
      t0 = t1;
    }
    find_chains(s.mems, p, p.secondary != 0, s.anchors, s.chains, s.dp);
    if (prof) {
      g_prof.chain_ns += prof_now() - t0;
      g_prof.anchors_n += (int64_t)s.anchors.size();
      g_prof.chains_n += (int64_t)s.chains.size();
    }
    if (mode == MODE_PLAN) {
      plan->mems = std::move(s.mems);
      plan->anchors = std::move(s.anchors);
      plan->chains = std::move(s.chains);
      memsp = &plan->mems;
      anchorsp = &plan->anchors;
      chainsp = &plan->chains;
      s.bk.mode = MODE_PLAN;
      s.bk.rec = &plan->jobs;
    } else {
      memsp = &s.mems;
      anchorsp = &s.anchors;
      chainsp = &s.chains;
      s.bk.mode = MODE_HOST;
    }
  }
  const std::vector<Mem>& mems = *memsp;
  const std::vector<Anchor>& anchors = *anchorsp;
  const std::vector<Chain>& chains = *chainsp;
  if (chains.empty()) {
    if (mode != MODE_PLAN) set_unmapped();
    return;
  }

  // RAII accounting of everything from selection onward: plan-mode
  // job building lands in select_ns, resolve replay in resolve_ns
  struct ProfScope {
    std::atomic<int64_t>* tgt;
    int64_t t0;
    ProfScope(std::atomic<int64_t>* t) : tgt(t), t0(t ? prof_now() : 0) {}
    ~ProfScope() {
      if (tgt) *tgt += prof_now() - t0;
    }
  } prof_scope(g_prof.on.load(std::memory_order_relaxed)
                   ? (mode == MODE_RESOLVE ? &g_prof.resolve_ns
                                           : &g_prof.select_ns)
                   : nullptr);

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
        if (mode != MODE_PLAN) ++o.chains_skipped[b];
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
      s.bk.cur_qrow = int32_t((ch.mate & 2) ? B + b : b);
      FillOut fo;
      chain_score(c, s, mems, fwd_anchors, read, slen, min_score, true,
                  &fo);
      int64_t lft = lift_pos(c, fo.pos);
      // check_max_score (aligner_ksw2.hpp:525-548)
      if (fo.score > max_score) {
        max_score = fo.score;
        nalt = 0;
      } else if (fo.score == max_score) {
        if (nalt < p.alt_cap && mode != MODE_PLAN) {
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
  if (mode == MODE_PLAN) {
    s.bk.mode = MODE_HOST;
    return;  // the tail needs real scores; resolve replays from here
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
  if (mode == MODE_RESOLVE) {
    // the winner's score pass already ran on the device; run host
    // traceback/finalize only (the reference's score_only/finalize
    // split, aligner_ksw2.hpp:2068-2075)
    s.bk.mode = MODE_HOST;
    fill_chain(c, s, mems, fwd_anchors, read, slen, false, &fin);
    fin.score = best_scores[0].score;
    fin.pos = fin.unmapped_lft ? 0 : fin.out_pos;
  } else {
    chain_score(c, s, mems, fwd_anchors, read, slen, min_score, false,
                &fin);
  }
  if (fin.score < min_score || !fin.finalized) {
    int32_t keep_alt = o.nalt[b];
    set_unmapped();
    o.nalt[b] = keep_alt;
    return;
  }

  o.flag[b] = strand ? 16 : 0;
  o.zs[b] = int32_t(score2);
  o.asc[b] = int32_t(fin.asc);
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

// ======================== paired-end runtime =========================
// Reference: the PE align path (aligner_ksw2.hpp:1000-1326), the
// paired selection (get_best_scores :1329-1431, check_paired_left_MEM
// :1471-1533), paired_chain_score (:2115-2308), orphan recovery
// (:1536-1658, 2330-2460) and fill_orphan (:2566-2711). Field-for-
// field faithful to the Python PE oracle (monitpu/oracle/pe.py).

#pragma pack(push, 8)
struct PeParams {
  SeParams se;
  double dir_thr;
  double ins_mean, ins_std;
  int32_t filter_dir, find_orphan, finalize, learn_gap_thr;
};
#pragma pack(pop)

struct ScoreT {
  int64_t score = 0;
  int64_t pos = 0;
  int64_t lft = 0;
  bool unmapped_lft = false;
};

struct PairedScore {
  int64_t tot = 0;
  int64_t dist = 0;
  ScoreT m1, m2;
  int32_t chain_i = 0;
  bool paired = false;
  int64_t win_start = 0, win_end = 0;  // orphan search window
};

// klib ksw_align-style local SW: best cell (first max in row-major
// scan) + symmetric reverse pass for the start (oracle/pe.py).
struct LocalHit {
  int32_t score = 0, qb = 0, qe = 0, tb = 0, te = 0;
};

void local_fwd(const int8_t* q, int32_t Q, const int8_t* t, int32_t T,
               int32_t sm, int32_t sx, int32_t go, int32_t ge,
               std::vector<int32_t>& H, std::vector<int32_t>& E,
               int32_t* best, int32_t* bi, int32_t* bj) {
  H.assign(T + 1, 0);
  E.assign(T + 1, 0);
  *best = 0;
  *bi = *bj = -1;
  for (int32_t i = 0; i < Q; ++i) {
    int32_t hd = 0, F = 0, hl = 0;
    for (int32_t j = 1; j <= T; ++j) {
      int32_t e = std::max(E[j] - ge, H[j] - go - ge);
      F = std::max(F - ge, hl - go - ge);
      int32_t h = std::max(0, hd + nscore(q[i], t[j - 1], sm, sx));
      h = std::max(h, std::max(e, F));
      E[j] = e;
      hd = H[j];
      H[j] = h;
      hl = h;
      if (h > *best) {
        *best = h;
        *bi = i;
        *bj = j - 1;
      }
    }
  }
}

LocalHit local_align(const Ctx& c, Scratch& s, const int8_t* q, int32_t Q,
                     const int8_t* t, int32_t T) {
  const SeParams& p = *c.p;
  LocalHit r;
  int32_t best, bi, bj;
  local_fwd(q, Q, t, T, p.smatch, p.smismatch, p.gapo, p.gape, s.H, s.F,
            &best, &bi, &bj);
  if (best <= 0) return r;
  r.score = best;
  r.qe = bi;
  r.te = bj;
  // reverse pass on the reversed prefixes
  std::vector<int8_t> qr(q, q + bi + 1), tr(t, t + bj + 1);
  std::reverse(qr.begin(), qr.end());
  std::reverse(tr.begin(), tr.end());
  int32_t b2, ri, rj;
  local_fwd(qr.data(), bi + 1, tr.data(), bj + 1, p.smatch, p.smismatch,
            p.gapo, p.gape, s.H, s.F, &b2, &ri, &rj);
  r.qb = r.qe - ri;
  r.tb = r.te - rj;
  return r;
}

struct PeCtx {
  const Ctx* c;
  const PeParams* p;
};

// mems for one pair: lanes rows [m1F=b, m2RC=B+b, m2F=2B+b, m1RC=3B+b];
// mate codes 0/3/1/2, rpos offsets 0/len1/0/len2; order + direction
// filter per aligner_ksw2.hpp:1006-1102.
void build_mems_pe(const Ctx& c, const PeParams& pp, const SeedArrays& sd,
                   int64_t B, int64_t b, int32_t len1, int32_t len2,
                   std::vector<Mem>& mems, Scratch& s) {
  mems.clear();
  const SeParams& p = *c.p;
  struct LaneDef {
    int64_t row;
    int32_t mate, off;
  };
  // filter_dir order: dir1 = m1F, m2RC; dir2 = m2F, m1RC
  // no-filter order: m1F, m1RC, m2F, m2RC (:1106-1109)
  LaneDef order_dir[4] = {{b, 0, 0},
                          {B + b, 3, len1},
                          {2 * B + b, 1, 0},
                          {3 * B + b, 2, len2}};
  LaneDef order_nod[4] = {{b, 0, 0},
                          {3 * B + b, 2, len2},
                          {2 * B + b, 1, 0},
                          {B + b, 3, len1}};
  LaneDef* lanes = pp.filter_dir ? order_dir : order_nod;

  s.slotmap.assign(4 * sd.S, -1);
  for (int l = 0; l < 4; ++l) {
    int64_t r = lanes[l].row;
    for (int64_t q = sd.rowstart[r]; q < sd.rowstart[r + 1]; ++q) {
      int32_t k = sd.order[q];
      s.slotmap[l * sd.S + sd.slot[k]] = k;
    }
  }
  Mem m;
  auto add_seed = [&](int lane, int64_t slot) {
    int32_t k = s.slotmap[lane * sd.S + slot];
    if (k < 0 || !extract_seed(c, sd, s, k, lanes[lane].mate,
                               lanes[lane].off, &m))
      return false;
    mems.push_back(std::move(m));
    return true;
  };
  std::vector<std::pair<int, int32_t>> parents;  // (lane, slot)
  int32_t n_dir1 = 0;
  for (int l = 0; l < 4; ++l) {
    for (int64_t i = 0; i < sd.K; ++i)
      if (add_seed(l, i)) parents.push_back({l, int32_t(i)});
    if (l == 1) n_dir1 = int32_t(mems.size());
  }
  for (const auto& [l, i] : parents) {
    add_seed(l, sd.K + i);
    add_seed(l, 2 * sd.K + i);
  }
  if (pp.filter_dir) {
    // direction decision (with the reference's dir2-stats-include-
    // halves quirk, :1049-1061)
    double avg1 = 0, avg2 = 0;
    int32_t n1 = 0;
    for (int32_t i = 0; i < n_dir1; ++i) avg1 += mems[i].len;
    // count dir2 PARENTS only for the divisor
    int32_t n2p = 0;
    for (size_t i = n_dir1; i < mems.size(); ++i) avg2 += mems[i].len;
    for (const auto& [l, _] : parents)
      if (l >= 2) ++n2p;
    n1 = n_dir1;
    if (n1 > 0) avg1 /= n1;
    if (n2p > 0) avg2 /= n2p;
    if (avg1 > avg2 && (avg1 - avg2) > pp.dir_thr)
      mems.erase(mems.begin() + n_dir1, mems.end());
    if (avg2 > avg1 && (avg2 - avg1) > pp.dir_thr)
      mems.erase(mems.begin(), mems.begin() + n_dir1);
  }
  if (p.filter_freq) seed_freq_filter(mems, p.freq_thr);
}

int32_t strand_of(const Chain& ch) {
  int32_t m = ch.mate;
  if (m == 0 || ((m & 2) && (m & 1))) return 0;
  return 1;
}

int64_t ins_tot(const PeParams& pp, int64_t s1, int64_t s2, int64_t d) {
  double ns = 0.0;
  if (pp.ins_std > 0.0) ns = (double(d) - pp.ins_mean) / pp.ins_std;
  int64_t tot = int64_t(double(s1) + double(s2) +
                        .721 * std::log(2. * std::erfc(std::fabs(ns) *
                                                       M_SQRT1_2)) *
                            pp.se.smatch +
                        .499);
  return tot < 0 ? 0 : tot;
}

struct PeRead {
  const int8_t *m1f, *m1r, *m2f, *m2r;
  int32_t len1, len2;
  int64_t min1, min2, min_score;
  // device lane rows of the 4 strand-applied reads (seed-stage layout
  // [m1F, m2RC, m2F, m1RC] x B) — the extz broker addresses queries by
  // lane row; unused in MODE_HOST
  int64_t row1f = 0, row1r = 0, row2f = 0, row2r = 0;
};

void split_mates(const std::vector<Mem>& mems,
                 const std::vector<Anchor>& anchors, const Chain& ch,
                 std::vector<Anchor>& a1, std::vector<Anchor>& a2,
                 int64_t* lm_pos, int64_t* rm_pos) {
  a1.clear();
  a2.clear();
  *lm_pos = INT64_MAX;
  *rm_pos = 0;
  for (auto it = ch.anchors.rbegin(); it != ch.anchors.rend(); ++it) {
    const Anchor& a = anchors[*it];
    const Mem& mem = mems[a.mem_i];
    int64_t occ = mem.occs[a.occ_i];
    *rm_pos = std::max(*rm_pos, occ + mem.len);
    *lm_pos = std::min(*lm_pos, occ);
    if ((mem.mate & 1) == 0)
      a1.push_back(a);
    else
      a2.push_back(a);
  }
}

struct PePair {
  PairedScore score;
  FillOut fin1, fin2;
  bool have_fin1 = false, have_fin2 = false;
  int orphan_mate = 0;  // 1/2 = that mate was filled by fill_orphan
};

void pe_chain_score(const Ctx& c, const PeParams& pp, Scratch& s,
                    const std::vector<Mem>& mems,
                    const std::vector<Anchor>& anchors, const Chain& ch,
                    const PeRead& rd, int32_t chain_i, bool score_only,
                    PePair* out) {
  out->score = PairedScore();
  out->score.chain_i = chain_i;
  out->have_fin1 = out->have_fin2 = false;
  if (!ch.paired) return;
  out->score.paired = true;
  int32_t strand = strand_of(ch);
  const int8_t* mate1 = strand ? rd.m1r : rd.m1f;
  const int8_t* mate2 = strand ? rd.m2f : rd.m2r;
  std::vector<Anchor> a1, a2;
  int64_t lm, rm;
  split_mates(mems, anchors, ch, a1, a2, &lm, &rm);
  FillOut f1, f2;
  s.bk.cur_qrow = int32_t(strand ? rd.row1r : rd.row1f);
  chain_score(c, s, mems, a1, mate1, rd.len1, rd.min1, score_only, &f1);
  s.bk.cur_qrow = int32_t(strand ? rd.row2f : rd.row2r);
  chain_score(c, s, mems, a2, mate2, rd.len2, rd.min2, score_only, &f2);
  out->score.m1 = {f1.score, f1.pos, lift_pos(c, f1.pos), f1.unmapped_lft};
  out->score.m2 = {f2.score, f2.pos, lift_pos(c, f2.pos), f2.unmapped_lft};
  out->score.dist = std::llabs(f2.pos - (f1.pos + rd.len1));
  out->score.tot =
      ins_tot(pp, f1.score, f2.score, out->score.dist);
  if (!score_only) {
    out->fin1 = std::move(f1);
    out->fin2 = std::move(f2);
    out->have_fin1 = out->have_fin2 = true;
  }
}

// fill_orphan (aligner_ksw2.hpp:2566-2711). Updates start/end in the
// score pass (klib local trim). Finalize writes into FillOut.
void fill_orphan(const Ctx& c, Scratch& s, int64_t* start, int64_t* end,
                 const int8_t* read, int32_t rlen, bool score_only,
                 FillOut* out) {
  *out = FillOut();
  const int8_t* text = c.text;
  int64_t ref_occ = *start;
  int64_t ref_len = *end - *start + 1;
  if (score_only) {
    LocalHit r = local_align(c, s, read, rlen, text + ref_occ,
                             int32_t(ref_len));
    *end = *start + r.te;
    *start += r.tb;
    ExtzOut ez = run_extz(c, s, read, rlen, text + ref_occ + r.tb,
                          r.te - r.tb + 1, FLAG_SCORE_ONLY, nullptr,
                          NEED_CORNER);
    out->score = ez.score;
    out->pos = *start;
    if (!seq_valid(c, *start, *end - *start + 1)) out->score = NEG_INF;
    return;
  }
  // finalize: global extz over the given (trimmed) window
  Cigar cig;
  ExtzOut ez = run_extz(c, s, read, rlen, text + ref_occ,
                        int32_t(ref_len), 0, &cig, NEED_CORNER);
  out->finalized = true;
  out->asc = ez.score;  // SAM AS (oracle: sam.asc = ez score, :2656)
  out->lift_cig = cig;
  write_md_core(text + ref_occ, read, cig, out->lift_md, &out->lift_nm);
  out->lift_pos = ref_occ;
  out->lift_rlen = int32_t(ref_len);
  int64_t lpos = 0;
  Cigar lops;
  bool any = lift_cigar(c, ref_occ, cig, &lpos, lops);
  int64_t lrlen = any ? cigar_rlen(lops) : 0;
  if (any && lrlen > 0) {
    write_md_core(text + lpos, read, lops, out->md, &out->nm);
    out->out_pos = lpos;
    out->cig = std::move(lops);
    out->rlen = int32_t(lrlen);
    out->score = ez.score;  // oracle: set only in the lifted branch
    out->pos = *start;
  } else {
    out->unmapped_lft = true;
    out->out_pos = 0;
    out->cig.clear();
    out->rlen = 0;
    // score/pos stay 0 (oracle _zero_score defaults): the pair total
    // must not credit an alignment that lifted into an insertion
  }
}

void pe_orphan_score(const Ctx& c, const PeParams& pp, Scratch& s,
                     const std::vector<Mem>& mems,
                     const std::vector<Anchor>& anchors, const Chain& ch,
                     const PeRead& rd, int32_t chain_i, double mean,
                     double std_dev, bool score_only, int64_t start,
                     int64_t end, PePair* out) {
  out->score = PairedScore();
  out->score.chain_i = chain_i;
  out->have_fin1 = out->have_fin2 = false;
  int32_t strand = strand_of(ch);
  const int8_t* mate1 = strand ? rd.m1r : rd.m1f;
  const int8_t* mate2 = strand ? rd.m2f : rd.m2r;
  std::vector<Anchor> a1, a2;
  int64_t lm, rm;
  split_mates(mems, anchors, ch, a1, a2, &lm, &rm);
  int64_t clamp = c.n - 10;  // reference: n - idx.get_w() (w = 10)
  FillOut f1, f2;
  if (score_only) {
    if (!a1.empty()) {
      chain_score(c, s, mems, a1, mate1, rd.len1, rd.min1, true, &f1);
      start = rm + int64_t(std::floor(mean - 4 * std_dev));
      end = rm + int64_t(std::ceil(mean + 4 * std_dev));
      start = std::min(std::max<int64_t>(start, 0), clamp);
      end = std::min(end, clamp);
      if (start < end)
        fill_orphan(c, s, &start, &end, mate2, rd.len2, true, &f2);
    } else {
      chain_score(c, s, mems, a2, mate2, rd.len2, rd.min2, true, &f2);
      start = lm + int64_t(std::floor(-mean - 4 * std_dev));
      end = lm + int64_t(std::ceil(-mean + 4 * std_dev));
      start = std::min(std::max<int64_t>(start, 0), clamp);
      end = std::min(end, clamp);
      if (start < end)
        fill_orphan(c, s, &start, &end, mate1, rd.len1, true, &f1);
    }
    out->score.win_start = start;
    out->score.win_end = end;
  } else {
    if (!a1.empty()) {
      chain_score(c, s, mems, a1, mate1, rd.len1, rd.min1, false, &f1);
      out->have_fin1 = true;
      out->orphan_mate = 2;
      if (start < end) {
        fill_orphan(c, s, &start, &end, mate2, rd.len2, false, &f2);
        out->have_fin2 = true;
      }
    } else {
      out->orphan_mate = 1;
      if (start < end) {
        fill_orphan(c, s, &start, &end, mate1, rd.len1, false, &f1);
        out->have_fin1 = true;
      }
      chain_score(c, s, mems, a2, mate2, rd.len2, rd.min2, false, &f2);
      out->have_fin2 = true;
    }
  }
  out->score.m1 = {f1.score, f1.pos, lift_pos(c, f1.pos), f1.unmapped_lft};
  out->score.m2 = {f2.score, f2.pos, lift_pos(c, f2.pos), f2.unmapped_lft};
  out->score.dist = std::llabs(f2.pos - (f1.pos + rd.len1));
  out->score.tot = ins_tot(pp, f1.score, f2.score, out->score.dist);
  if (!score_only) {
    out->fin1 = std::move(f1);
    out->fin2 = std::move(f2);
  }
}

// Per-pair output views: mate1 = row b, mate2 = row B + b of 2B arrays.
struct PeOut {
  SeOut se;  // shared layout, 2B rows
  int32_t* mapq;
  int64_t* pnext;
  int64_t* tlen;
  int8_t* strand;       // -1 = never finalized (original orientation)
  uint8_t* aligned;     // [B]
  uint8_t* chained;     // [B]
  uint8_t* orphan_rec;  // [B]
  uint8_t* learn_ok;    // [B]
  int64_t* learn_dist;  // [B]
};

struct PeState {
  std::vector<Mem> mems;
  std::vector<Anchor> anchors;
  std::vector<Chain> chains;
  std::vector<PairedScore> best_scores;
  int64_t score2 = 0, score2_m1 = 0, score2_m2 = 0;
  int32_t sub_n = 0;
  bool second_best = false;
  // SAM staging (written to outputs at the end)
  struct MateSam {
    int32_t flag = 4;
    int32_t rname = -1;
    int64_t pos = 0;
    int32_t mapq = 255;
    int64_t pnext = 0, tlen = 0;
    int64_t asc = 0, zs = 0;
    Cigar cig;
    std::string md;
    int32_t nm = 0, rlen = 0;
    int32_t lift_rname = -1;
    int64_t lift_pos = 0;
    Cigar lift_cig;
    std::string lift_md;
    int32_t lift_nm = 0, lift_rlen = 0;
    bool unmapped_lft = false;
  } sam1, sam2;
  std::vector<std::pair<int32_t, int64_t>> alt1_pos, alt2_pos;  // (rname, pos)
  std::vector<int64_t> alt1_sc, alt2_sc;
};

// check_paired_left_MEM (aligner_ksw2.hpp:1471-1533); missing-mate
// positions fall back to 0 (reference reads uninitialized memory).
bool check_paired_left_mem(const Ctx& c, const PeState& st,
                           std::vector<std::pair<int64_t, int64_t>>& v1,
                           std::vector<std::pair<int64_t, int64_t>>& v2,
                           int32_t i) {
  const Chain& ch = st.chains[i];
  int64_t p1 = -1, p2 = -1;
  for (auto it = ch.anchors.rbegin(); it != ch.anchors.rend(); ++it) {
    const Anchor& a = st.anchors[*it];
    const Mem& mem = st.mems[a.mem_i];
    int64_t pos = mem.occs[a.occ_i];
    if ((mem.mate & 1) == 0 && p1 < 0) {
      int64_t l = lift_pos(c, pos);
      p1 = l - c.seq_starts[seq_of(c, l)] + 1;
    } else if ((mem.mate & 1) && p2 < 0) {
      int64_t l = lift_pos(c, pos);
      p2 = l - c.seq_starts[seq_of(c, l)] + 1;
    }
    if (p1 >= 0 && p2 >= 0) break;
  }
  if (p1 < 0) p1 = 0;
  if (p2 < 0) p2 = 0;
  int32_t rd = c.p->region_dist;
  for (size_t j = 0; j < v1.size(); ++j) {
    if (std::llabs(v1[j].first - p1) < rd &&
        std::llabs(v2[j].first - p2) < rd && v1[j].second == ch.score)
      return true;
  }
  v1.push_back({p1, ch.score});
  v2.push_back({p2, ch.score});
  return false;
}

// get_best_scores (aligner_ksw2.hpp:1329-1431)
void pe_get_best_scores(const Ctx& c, const PeParams& pp, Scratch& s,
                        PeState& st, const PeRead& rd, int32_t max_pen) {
  const SeParams& p = pp.se;
  std::vector<int64_t> seen;
  auto seen_score = [&](int64_t sc) {
    for (int64_t v : seen)
      if (v == sc) return true;
    return false;
  };
  std::vector<std::pair<int64_t, int64_t>> v1, v2;
  int64_t max1 = 0, max2 = 0;
  auto check_max = [&](int64_t maxs, const ScoreT& sc,
                       std::vector<std::pair<int32_t, int64_t>>& altp,
                       std::vector<int64_t>& alts) {
    if (sc.score > maxs) {
      altp.clear();
      alts.clear();
      return sc.score;
    }
    if (sc.score == maxs) {
      int32_t sq = seq_of(c, sc.pos);
      altp.push_back({sq, sc.pos - c.seq_starts[sq] + 1});
      alts.push_back(sc.score);
    }
    return maxs;
  };
  int32_t i = 0;
  PePair pair;
  while (i < (int32_t)st.chains.size() &&
         (int32_t)seen.size() < p.check_k) {
    if (!seen_score(st.chains[i].score))
      seen.push_back(st.chains[i].score);
    if (p.left_mem_check && check_paired_left_mem(c, st, v1, v2, i)) {
      ++i;
      continue;
    }
    if ((int32_t)seen.size() < p.check_k) {
      pe_chain_score(c, pp, s, st.mems, st.anchors, st.chains[i], rd, i,
                     true, &pair);
      PairedScore& score = pair.score;
      max1 = check_max(max1, score.m1, st.alt1_pos, st.alt1_sc);
      max2 = check_max(max2, score.m2, st.alt2_pos, st.alt2_sc);
      if (score.tot >= rd.min_score) {
        bool replaced = false;
        int32_t j = 0;
        while (j < (int32_t)st.best_scores.size()) {
          PairedScore& b = st.best_scores[j];
          if (std::llabs(b.m1.lft - score.m1.lft) < p.region_dist &&
              std::llabs(b.m2.lft - score.m2.lft) < p.region_dist) {
            if (score.tot > b.tot) {
              if (replaced) {
                PairedScore z;
                z.chain_i = i;
                st.best_scores[j] = z;
              } else {
                st.best_scores[j] = score;
                replaced = true;
              }
            } else {
              j = (int32_t)st.best_scores.size();
              replaced = true;
            }
          }
          ++j;
        }
        if (!replaced) st.best_scores.push_back(score);
      }
      ++i;
    }
  }
  while ((int32_t)st.best_scores.size() < 2) {
    PairedScore z;
    z.chain_i = (int32_t)st.chains.size();
    st.best_scores.push_back(z);
  }
  std::stable_sort(st.best_scores.begin(), st.best_scores.end(),
                   [](const PairedScore& a, const PairedScore& b) {
                     if (a.tot != b.tot) return a.tot > b.tot;
                     if (a.m1.lft != b.m1.lft) return a.m1.lft > b.m1.lft;
                     return a.m2.lft > b.m2.lft;
                   });
  int32_t j = 1;
  st.sub_n = 0;
  while (j < (int32_t)st.best_scores.size() &&
         st.best_scores[j].tot >= st.best_scores[0].tot - max_pen) {
    ++st.sub_n;
    ++j;
  }
  st.score2 = st.best_scores[1].tot;
  st.score2_m1 = st.best_scores[1].m1.score;
  st.score2_m2 = st.best_scores[1].m2.score;
  st.second_best = st.score2 >= rd.min_score;
}

void emit_mate_sam(const Ctx& c, const FillOut& fin,
                   PeState::MateSam& sam) {
  if (!fin.finalized) return;
  int32_t lsq = seq_of(c, fin.lift_pos);
  sam.lift_rname = lsq;
  sam.lift_pos = fin.lift_pos - c.seq_starts[lsq] + 1;
  sam.lift_cig = fin.lift_cig;
  sam.lift_md = fin.lift_md;
  sam.lift_nm = fin.lift_nm;
  sam.lift_rlen = fin.lift_rlen;
  sam.asc = fin.asc;
  if (fin.unmapped_lft) {
    sam.rname = -1;
    sam.pos = 0;
    sam.cig.clear();
    sam.rlen = 0;
    sam.unmapped_lft = true;
  } else {
    int32_t sq = seq_of(c, fin.out_pos);
    sam.rname = sq;
    sam.pos = fin.out_pos - c.seq_starts[sq] + 1;
    sam.cig = fin.cig;
    sam.md = fin.md;
    sam.nm = fin.nm;
    sam.rlen = fin.rlen;
  }
}

// BWA-MEM SE MAPQ (mapq.hpp:146-184); mirrors align/mapq.py.
int32_t mapq_se_bwa(int64_t score, int64_t score2, int64_t rlen,
                    int64_t qlen, int32_t min_seed_len, int32_t sm,
                    int32_t sx, int32_t sub_n) {
  double l = double(std::max(rlen, qlen));
  int64_t sub = score2 ? score2 : int64_t(min_seed_len) * sm;
  if (sub >= score) return 0;
  double identity =
      1.0 - (l * sm - double(score)) / (sm + sx) / l;
  int32_t mapq;
  if (score == 0) {
    mapq = 0;
  } else {
    double coeff_len = 50.0;
    double coeff_fac = double(int32_t(std::log(50.0)));
    double tmp = l < coeff_len ? 1.0 : coeff_fac / std::log(l);
    tmp *= identity * identity;
    mapq = int32_t(6.02 * double(score - sub) / sm * tmp * tmp + .499);
  }
  if (sub_n > 0)
    mapq -= int32_t(4.343 * std::log(double(sub_n) + 1) + .499);
  return std::max(0, std::min(60, mapq));
}

int32_t raw_mapq(int64_t diff, int32_t a) {
  return int32_t(6.02 * double(diff) / a + .499);
}

// the !score_only tail shared by paired_chain_score and the orphan
// variant (:2206-2288, 2470-2555)
void pe_finalize_pair(const Ctx& c, const PeParams& pp, PeState& st,
                      const PeRead& rd, const PePair& pair,
                      int32_t strand) {
  const SeParams& p = pp.se;
  const PairedScore& score = pair.score;
  PeState::MateSam& s1 = st.sam1;
  PeState::MateSam& s2 = st.sam2;
  if (pair.have_fin1) emit_mate_sam(c, pair.fin1, s1);
  if (pair.have_fin2) emit_mate_sam(c, pair.fin2, s2);
  // chain_score-emitted mates get zs + mapq when finalized
  // (aligner_ksw2.hpp:2076-2084); fill_orphan-emitted mates get mapq
  // only, computed unconditionally (:2441-2443, 2452-2454)
  if (pair.orphan_mate != 1) {
    if (pair.have_fin1 && pair.fin1.finalized) {
      s1.zs = st.score2_m1;
      s1.mapq = mapq_se_bwa(s1.asc, st.score2_m1, s1.rlen, rd.len1,
                            p.min_len, p.smatch, p.smismatch, st.sub_n);
    }
  } else {
    s1.mapq = mapq_se_bwa(s1.asc, st.score2_m1, s1.rlen, rd.len1,
                          p.min_len, p.smatch, p.smismatch, st.sub_n);
  }
  if (pair.orphan_mate != 2) {
    if (pair.have_fin2 && pair.fin2.finalized) {
      s2.zs = st.score2_m2;
      s2.mapq = mapq_se_bwa(s2.asc, st.score2_m2, s2.rlen, rd.len2,
                            p.min_len, p.smatch, p.smismatch, st.sub_n);
    }
  } else {
    s2.mapq = mapq_se_bwa(s2.asc, st.score2_m2, s2.rlen, rd.len2,
                          p.min_len, p.smatch, p.smismatch, st.sub_n);
  }
  bool ok1 = score.m1.score >= rd.min1 && !score.m1.unmapped_lft;
  bool ok2 = score.m2.score >= rd.min2 && !score.m2.unmapped_lft;
  if (ok1 && ok2) {
    s1.pnext = s2.pos;
    s2.pnext = s1.pos;
    int64_t tlen;
    if (s2.pos > s1.pos) {
      tlen = (s2.pos + rd.len2) - s1.pos;
      s1.tlen = tlen;
      s2.tlen = -tlen;
    } else {
      tlen = (s1.pos + rd.len1) - s2.pos;
      s1.tlen = -tlen;
      s2.tlen = tlen;
    }
    // compute_mapq_pe_bwa (mapq.hpp:186-223); score_un = 0 (:2237)
    int64_t sub = std::max<int64_t>(st.score2, 0);
    int32_t mapq = raw_mapq(score.tot - sub, p.smatch);
    if (st.sub_n > 0)
      mapq -= int32_t(4.343 * std::log(double(st.sub_n) + 1) + .499);
    mapq = std::max(0, std::min(60, mapq));
    int32_t m1q = (int32_t)s1.mapq, m2q = (int32_t)s2.mapq;
    if (score.tot > 0) {  // score > score_un (= 0)
      m1q = m1q > mapq ? m1q : (mapq < m1q + 40 ? mapq : m1q + 40);
      m2q = m2q > mapq ? m2q : (mapq < m2q + 40 ? mapq : m2q + 40);
      m1q = std::min(m1q,
                     raw_mapq(score.m1.score - st.score2_m1, p.smatch));
      m2q = std::min(m2q,
                     raw_mapq(score.m2.score - st.score2_m2, p.smatch));
    }
    s1.mapq = m1q;
    s2.mapq = m2q;
    s1.asc = s2.asc = score.tot;
    s1.zs = s2.zs = st.score2;
    int32_t base = 1 | 2;  // PAIRED | MAPPED_PAIRED
    if (strand) {
      s1.flag = base | 16 | 64;
      s2.flag = base | 32 | 128;
    } else {
      s1.flag = base | 32 | 64;
      s2.flag = base | 16 | 128;
    }
  } else if (ok1) {
    s1.zs = st.score2_m1;
    s1.flag = 1 | 8 | 64;
    s2.flag = 1 | 4 | 128;
    if (strand) s1.flag |= 16;
    s2.rname = s1.rname;
    s2.pos = s1.pos;
    s2.mapq = s1.mapq;
    s2.cig.clear();
    s2.pnext = s1.pnext = s1.pos;
    s2.tlen = s1.tlen = 0;
  } else if (ok2) {
    s1.zs = st.score2_m2;
    s1.flag = 1 | 4 | 64;
    s2.flag = 1 | 8 | 128;
    if (!strand) s2.flag |= 16;
    s1.rname = s2.rname;
    s1.pos = s2.pos;
    s1.mapq = s2.mapq;
    s1.cig.clear();
    s1.pnext = s2.pnext = s2.pos;
    s1.tlen = s2.tlen = 0;
  } else {
    s1.flag = s2.flag = 1 | 4 | 8;
  }
}

bool pe_orphan_recovery(const Ctx& c, const PeParams& pp, Scratch& s,
                        PeState& st, const PeRead& rd, int32_t max_pen,
                        int32_t* out_strand) {
  const SeParams& p = pp.se;
  std::vector<PairedScore> best;
  PePair pair;
  for (int32_t i = 0; i < (int32_t)st.chains.size(); ++i) {
    pe_orphan_score(c, pp, s, st.mems, st.anchors, st.chains[i], rd, i,
                    pp.ins_mean, pp.ins_std, true, 0, 0, &pair);
    PairedScore& score = pair.score;
    if (score.tot >= rd.min_score) {
      bool replaced = false;
      int32_t j = 0;
      while (j < (int32_t)best.size()) {
        PairedScore& b = best[j];
        if (std::llabs(b.m1.lft - score.m1.lft) < p.region_dist &&
            std::llabs(b.m2.lft - score.m2.lft) < p.region_dist) {
          if (score.tot > b.tot) {
            if (replaced) {
              PairedScore z;
              z.chain_i = i;
              best[j] = z;
            } else {
              best[j] = score;
              replaced = true;
            }
          } else {
            j = (int32_t)best.size();
            replaced = true;
          }
        }
        ++j;
      }
      if (!replaced) best.push_back(score);
    }
  }
  while ((int32_t)best.size() < 2) {
    PairedScore z;
    z.chain_i = (int32_t)st.chains.size();
    best.push_back(z);
  }
  std::stable_sort(best.begin(), best.end(),
                   [](const PairedScore& a, const PairedScore& b) {
                     if (a.tot != b.tot) return a.tot > b.tot;
                     if (a.m1.lft != b.m1.lft) return a.m1.lft > b.m1.lft;
                     return a.m2.lft > b.m2.lft;
                   });
  if (best[0].tot < rd.min_score) return false;
  int32_t j = 1;
  st.sub_n = 0;
  while (j < (int32_t)best.size() &&
         best[j].tot >= best[0].tot - max_pen) {
    ++st.sub_n;
    ++j;
  }
  st.score2 = best[1].tot;
  st.score2_m1 = best[1].m1.score;
  st.score2_m2 = best[1].m2.score;
  st.second_best = st.score2 >= rd.min_score;
  int32_t ci = best[0].chain_i;
  PePair fin;
  pe_orphan_score(c, pp, s, st.mems, st.anchors, st.chains[ci], rd, ci,
                  pp.ins_mean, pp.ins_std, false, best[0].win_start,
                  best[0].win_end, &fin);
  int32_t strand = strand_of(st.chains[ci]);
  *out_strand = strand;
  pe_finalize_pair(c, pp, st, rd, fin, strand);
  return fin.score.tot >= rd.min_score;
}

void pe_write_mate(const Ctx& c, const PeState::MateSam& sam, int64_t row,
                   const SeOut& o, const PeOut& po) {
  const SeParams& p = *c.p;
  o.flag[row] = sam.flag;
  o.rname[row] = sam.rname;
  o.pos[row] = sam.pos;
  po.mapq[row] = sam.mapq;
  po.pnext[row] = sam.pnext;
  po.tlen[row] = sam.tlen;
  o.asc[row] = int32_t(sam.asc);
  o.zs[row] = int32_t(sam.zs);
  o.nm[row] = sam.nm;
  o.rlen[row] = sam.rlen;
  emit_cigar(sam.cig, o.cigar + row * p.cigar_cap, &o.ncigar[row],
             p.cigar_cap);
  emit_str(sam.md, o.md + row * p.md_cap, p.md_cap);
  o.lift_rname[row] = sam.lift_rname;
  o.lift_pos[row] = sam.lift_pos;
  emit_cigar(sam.lift_cig, o.lift_cigar + row * p.cigar_cap,
             &o.lift_ncigar[row], p.cigar_cap);
  emit_str(sam.lift_md, o.lift_md + row * p.md_cap, p.md_cap);
  o.lift_nm[row] = sam.lift_nm;
  o.lift_rlen[row] = sam.lift_rlen;
  o.unmapped_lft[row] = sam.unmapped_lft ? 1 : 0;
}

void align_one_pe(const Ctx& c, const PeParams& pp, Scratch& s,
                  const SeedArrays& sd, const int8_t* m1f,
                  const int8_t* m1r, const int8_t* m2f, const int8_t* m2r,
                  int32_t len1, int32_t len2, int64_t B, int64_t b,
                  const PeOut& po, int mode = MODE_HOST,
                  ReadPlan* plan = nullptr) {
  const SeParams& p = pp.se;
  int32_t max_pen = std::max(p.smatch + p.smismatch, p.gapo + p.gape);
  PeRead rd{m1f,  m1r,  m2f, m2r, len1, len2,
            int64_t(20 + 8 * std::log(double(len1))),
            int64_t(20 + 8 * std::log(double(len2))), 0};
  rd.min_score = rd.min1 + rd.min2;
  // seed-stage lane rows: [m1F, m2RC, m2F, m1RC] x B
  rd.row1f = b;
  rd.row2r = B + b;
  rd.row2f = 2 * B + b;
  rd.row1r = 3 * B + b;

  PeState st;
  if (mode == MODE_RESOLVE) {
    st.mems = std::move(plan->mems);
    st.anchors = std::move(plan->anchors);
    st.chains = std::move(plan->chains);
    s.bk.mode = MODE_RESOLVE;
    s.bk.cursor = plan->job_off;
    s.bk.end = plan->job_off + (int64_t)plan->jobs.size();
  } else {
    const bool prof = g_prof.on.load(std::memory_order_relaxed);
    int64_t t0 = prof ? prof_now() : 0;
    build_mems_pe(c, pp, sd, B, b, len1, len2, st.mems, s);
    if (prof) {
      int64_t t1 = prof_now();
      g_prof.build_ns += t1 - t0;
      g_prof.mems_n += (int64_t)st.mems.size();
      t0 = t1;
    }
    find_chains(st.mems, p, p.secondary != 0, st.anchors, st.chains,
                s.dp);
    if (prof) {
      g_prof.chain_ns += prof_now() - t0;
      g_prof.anchors_n += (int64_t)st.anchors.size();
      g_prof.chains_n += (int64_t)st.chains.size();
    }
  }
  if (mode == MODE_PLAN) {
    // record the score-pass extz jobs (the sequence of score-only
    // calls made by pe_get_best_scores is score-independent: chain
    // order and the left-MEM dedup depend only on chain-DP scores and
    // positions); orphan recovery stays host-side in resolve — it
    // runs only for the rare unaligned-but-chained pairs
    if (!st.chains.empty()) {
      s.bk.mode = MODE_PLAN;
      s.bk.rec = &plan->jobs;
      pe_get_best_scores(c, pp, s, st, rd, max_pen);
      s.bk.mode = MODE_HOST;
    }
    plan->mems = std::move(st.mems);
    plan->anchors = std::move(st.anchors);
    plan->chains = std::move(st.chains);
    return;  // no outputs in plan mode
  }
  po.chained[b] = st.chains.empty() ? 0 : 1;
  po.aligned[b] = 0;
  po.orphan_rec[b] = 0;
  po.learn_ok[b] = 0;
  po.learn_dist[b] = 0;
  po.strand[b] = -1;
  int32_t strand = -1;
  bool aligned = false;

  if (!st.chains.empty()) {
    pe_get_best_scores(c, pp, s, st, rd, max_pen);
    // the winner finalize + orphan recovery run host-side (banded
    // extz); the broker's job stream is fully consumed above
    s.bk.mode = MODE_HOST;
    if (st.best_scores[0].tot >= rd.min_score) {
      if (pp.finalize) {
        int32_t ci = st.best_scores[0].chain_i;
        PePair fin;
        pe_chain_score(c, pp, s, st.mems, st.anchors, st.chains[ci], rd,
                       ci, false, &fin);
        strand = strand_of(st.chains[ci]);
        pe_finalize_pair(c, pp, st, rd, fin, strand);
        aligned = fin.score.tot >= rd.min_score;
      } else {
        aligned = true;
        // learning outputs (learn_fragment_model gate, :831)
        if (!st.second_best ||
            (st.best_scores[0].tot - st.best_scores[1].tot) >
                pp.learn_gap_thr) {
          po.learn_ok[b] = 1;
          po.learn_dist[b] = st.best_scores[0].dist;
        }
      }
    } else {
      st.alt1_pos.clear();
      st.alt1_sc.clear();
      st.alt2_pos.clear();
      st.alt2_sc.clear();
    }
  }
  if (pp.finalize && !aligned && po.chained[b] && pp.find_orphan) {
    int32_t os = -1;
    if (pe_orphan_recovery(c, pp, s, st, rd, max_pen, &os)) {
      aligned = true;
      po.orphan_rec[b] = 1;
      strand = os;
    } else if (os >= 0) {
      strand = os;  // orphan finalize ran but stayed below min_score
    }
  }
  po.aligned[b] = aligned ? 1 : 0;
  po.strand[b] = int8_t(strand);

  // outputs
  pe_write_mate(c, st.sam1, b, po.se, po);
  pe_write_mate(c, st.sam2, B + b, po.se, po);
  // AA entries beyond alt_cap are dropped (the reference's vector is
  // unbounded; equal-top-score chains rarely exceed a handful)
  auto dump_alt = [&](const std::vector<std::pair<int32_t, int64_t>>& ap,
                      const std::vector<int64_t>& as_, int64_t row) {
    int32_t n = std::min<int32_t>((int32_t)ap.size(), p.alt_cap);
    for (int32_t k = 0; k < n; ++k) {
      po.se.alt_rname[row * p.alt_cap + k] = ap[k].first;
      po.se.alt_pos[row * p.alt_cap + k] = ap[k].second;
      po.se.alt_score[row * p.alt_cap + k] = int32_t(as_[k]);
    }
    po.se.nalt[row] = n;
  };
  dump_alt(st.alt1_pos, st.alt1_sc, b);
  dump_alt(st.alt2_pos, st.alt2_sc, B + b);
  po.se.chains_skipped[b] = 0;
  po.se.chains_skipped[B + b] = 0;
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
    const int64_t* s_occ, int64_t n_seeds, int64_t S, int64_t K,
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
                n_seeds, S, K, {}, {}};
  bucket_rows(sd, 2 * B);
  SeOut out{o_flag,       o_rname,       o_pos,        o_as,
            o_zs,         o_nm,          o_rlen,       o_cigar,
            o_ncigar,     o_md,          o_lift_rname, o_lift_pos,
            o_lift_cigar, o_lift_ncigar, o_lift_md,    o_lift_nm,
            o_lift_rlen,  o_unmapped_lft, o_alt_rname, o_alt_pos,
            o_alt_score,  o_nalt,        o_chains_skipped};
  int32_t n_threads = std::max(1, prm->n_threads);
  const bool dbg = g_rt_debug;
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

// ---- device-extz split entries (plan -> device score -> resolve) ----

int64_t monitpu_postseed_se_plan(
    const int8_t* text, int64_t n, const int64_t* seq_starts, int32_t nseq,
    const int64_t* lift_hs, const int64_t* lift_rs, const uint8_t* lift_ins,
    const int64_t* lift_se, int64_t n_lift, const int8_t* fwd,
    const int8_t* rcv, const int32_t* lens, int64_t B, int64_t M,
    const int32_t* s_row, const int32_t* s_slot, const int32_t* s_len,
    const int32_t* s_idx, const int32_t* s_cnt, const int32_t* s_off,
    const int64_t* s_occ, int64_t n_seeds, int64_t S, int64_t K,
    const SeParams* prm, int32_t q_cap, int32_t t_cap, void** out_handle) {
  Ctx c{text,    n,       seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, prm};
  SeedArrays sd{s_row, s_slot, s_len, s_idx, s_cnt, s_off, s_occ,
                n_seeds, S, K, {}, {}};
  bucket_rows(sd, 2 * B);
  auto* h = new SeHandle();
  h->plans.resize(B);
  h->q_cap = q_cap;
  h->t_cap = t_cap;
  int32_t n_threads = std::max(1, prm->n_threads);
  SeOut dummy{};  // never written: all output stores are mode-guarded
  auto work = [&](int64_t lo, int64_t hi) {
    Scratch s;
    s.bk.q_cap = q_cap;
    s.bk.t_cap = t_cap;
    for (int64_t b = lo; b < hi; ++b)
      align_one(c, s, sd, fwd + b * M, rcv + b * M, lens[b], B, b, dummy,
                MODE_PLAN, &h->plans[b]);
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
  int64_t total = 0;
  for (auto& pl : h->plans) total += (int64_t)pl.jobs.size();
  if (g_prof.on.load(std::memory_order_relaxed)) g_prof.jobs_n += total;
  h->alljobs.reserve(total);
  for (auto& pl : h->plans) {
    pl.job_off = (int64_t)h->alljobs.size();
    h->alljobs.insert(h->alljobs.end(), pl.jobs.begin(), pl.jobs.end());
  }
  *out_handle = h;
  return total;
}

int monitpu_postseed_se_jobs(void* handle, int32_t* qrow, int32_t* qoff,
                             int32_t* qlen, uint8_t* qrev, int64_t* tpos,
                             int32_t* tlen, uint8_t* trev) {
  auto* h = (SeHandle*)handle;
  for (size_t k = 0; k < h->alljobs.size(); ++k) {
    const ExtzJob& j = h->alljobs[k];
    qrow[k] = j.qrow;
    qoff[k] = j.qoff;
    qlen[k] = j.qlen;
    qrev[k] = uint8_t(j.qrev);
    tpos[k] = j.tpos;
    tlen[k] = j.tlen;
    trev[k] = uint8_t(j.trev);
  }
  return 0;
}

int monitpu_postseed_se_resolve(
    void* handle, const int8_t* text, int64_t n, const int64_t* seq_starts,
    int32_t nseq, const int64_t* lift_hs, const int64_t* lift_rs,
    const uint8_t* lift_ins, const int64_t* lift_se, int64_t n_lift,
    const int8_t* fwd, const int8_t* rcv, const int32_t* lens, int64_t B,
    int64_t M, const SeParams* prm, const int32_t* j_mqe,
    const int32_t* j_mqe_t, const int32_t* j_corner, int32_t* o_flag,
    int32_t* o_rname, int64_t* o_pos, int32_t* o_as, int32_t* o_zs,
    int32_t* o_nm, int32_t* o_rlen, uint32_t* o_cigar, int32_t* o_ncigar,
    char* o_md, int32_t* o_lift_rname, int64_t* o_lift_pos,
    uint32_t* o_lift_cigar, int32_t* o_lift_ncigar, char* o_lift_md,
    int32_t* o_lift_nm, int32_t* o_lift_rlen, uint8_t* o_unmapped_lft,
    int32_t* o_alt_rname, int64_t* o_alt_pos, int32_t* o_alt_score,
    int32_t* o_nalt, int32_t* o_chains_skipped) {
  auto* h = (SeHandle*)handle;
  Ctx c{text,    n,       seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, prm};
  SeedArrays sd{};  // unused in resolve (plans carry mems/chains)
  SeOut out{o_flag,       o_rname,       o_pos,        o_as,
            o_zs,         o_nm,          o_rlen,       o_cigar,
            o_ncigar,     o_md,          o_lift_rname, o_lift_pos,
            o_lift_cigar, o_lift_ncigar, o_lift_md,    o_lift_nm,
            o_lift_rlen,  o_unmapped_lft, o_alt_rname, o_alt_pos,
            o_alt_score,  o_nalt,        o_chains_skipped};
  int32_t n_threads = std::max(1, prm->n_threads);
  std::vector<int64_t> mism(std::max(n_threads, 1), 0);
  auto work = [&](int32_t ti, int64_t lo, int64_t hi) {
    Scratch s;
    s.bk.q_cap = h->q_cap;  // replay plan's dev_ok decisions exactly
    s.bk.t_cap = h->t_cap;
    s.bk.jobs = h->alljobs.data();
    s.bk.mqe = j_mqe;
    s.bk.mqe_t = j_mqe_t;
    s.bk.corner = j_corner;
    for (int64_t b = lo; b < hi; ++b)
      align_one(c, s, sd, fwd + b * M, rcv + b * M, lens[b], B, b, out,
                MODE_RESOLVE, &h->plans[b]);
    mism[ti] = s.bk.mismatch;
  };
  if (n_threads == 1 || B <= 1) {
    work(0, 0, B);
  } else {
    std::vector<std::thread> pool;
    int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(B, lo + chunk);
      if (lo >= hi) break;
      pool.emplace_back(work, t, lo, hi);
    }
    for (auto& t : pool) t.join();
  }
  int64_t total_mism = 0;
  for (int64_t m : mism) total_mism += m;
  return total_mism > 0 ? 1 : 0;
}

void monitpu_postseed_se_free(void* handle) { delete (SeHandle*)handle; }

// Paired-end entry: seed rows [m1F, m2RC, m2F, m1RC] x B (4B lanes);
// per-mate outputs in 2B rows (mate1 = b, mate2 = B + b).
int monitpu_postseed_pe(
    const int8_t* text, int64_t n, const int64_t* seq_starts, int32_t nseq,
    const int64_t* lift_hs, const int64_t* lift_rs, const uint8_t* lift_ins,
    const int64_t* lift_se, int64_t n_lift, const int8_t* m1f,
    const int8_t* m1r, const int8_t* m2f, const int8_t* m2r,
    const int32_t* len1, const int32_t* len2, int64_t B, int64_t M,
    const int32_t* s_row, const int32_t* s_slot, const int32_t* s_len,
    const int32_t* s_idx, const int32_t* s_cnt, const int32_t* s_off,
    const int64_t* s_occ, int64_t n_seeds, int64_t S, int64_t K,
    const PeParams* prm, int32_t* o_flag, int32_t* o_rname,
    int64_t* o_pos, int32_t* o_as, int32_t* o_zs, int32_t* o_nm,
    int32_t* o_rlen, uint32_t* o_cigar, int32_t* o_ncigar, char* o_md,
    int32_t* o_lift_rname, int64_t* o_lift_pos, uint32_t* o_lift_cigar,
    int32_t* o_lift_ncigar, char* o_lift_md, int32_t* o_lift_nm,
    int32_t* o_lift_rlen, uint8_t* o_unmapped_lft, int32_t* o_alt_rname,
    int64_t* o_alt_pos, int32_t* o_alt_score, int32_t* o_nalt,
    int32_t* o_chains_skipped, int32_t* o_mapq, int64_t* o_pnext,
    int64_t* o_tlen, int8_t* o_strand, uint8_t* o_aligned,
    uint8_t* o_chained, uint8_t* o_orphan_rec, uint8_t* o_learn_ok,
    int64_t* o_learn_dist) {
  Ctx c{text,    n,        seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, &prm->se};
  SeedArrays sd{s_row, s_slot, s_len, s_idx, s_cnt, s_off, s_occ,
                n_seeds, S, K, {}, {}};
  bucket_rows(sd, 4 * B);
  SeOut se_out{o_flag,       o_rname,       o_pos,        o_as,
               o_zs,         o_nm,          o_rlen,       o_cigar,
               o_ncigar,     o_md,          o_lift_rname, o_lift_pos,
               o_lift_cigar, o_lift_ncigar, o_lift_md,    o_lift_nm,
               o_lift_rlen,  o_unmapped_lft, o_alt_rname, o_alt_pos,
               o_alt_score,  o_nalt,        o_chains_skipped};
  PeOut po{se_out,   o_mapq,    o_pnext,      o_tlen,     o_strand,
           o_aligned, o_chained, o_orphan_rec, o_learn_ok, o_learn_dist};
  int32_t n_threads = std::max(1, prm->se.n_threads);
  auto work = [&](int64_t lo, int64_t hi) {
    Scratch s;
    for (int64_t b = lo; b < hi; ++b)
      align_one_pe(c, *prm, s, sd, m1f + b * M, m1r + b * M, m2f + b * M,
                   m2r + b * M, len1[b], len2[b], B, b, po);
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

// ---- PE device-extz split (plan -> device score -> resolve) ----
// Mirrors the SE split: PLAN replays pe_get_best_scores with dummy
// scores recording every score-only extz call; RESOLVE replays it
// consuming the device (mqe, mqe_t, corner) stream, then finalizes the
// winner (and any orphan recovery) host-side with banded extz. Handles
// are SeHandle — share monitpu_postseed_se_jobs / _free.

int64_t monitpu_postseed_pe_plan(
    const int8_t* text, int64_t n, const int64_t* seq_starts, int32_t nseq,
    const int64_t* lift_hs, const int64_t* lift_rs, const uint8_t* lift_ins,
    const int64_t* lift_se, int64_t n_lift, const int8_t* m1f,
    const int8_t* m1r, const int8_t* m2f, const int8_t* m2r,
    const int32_t* len1, const int32_t* len2, int64_t B, int64_t M,
    const int32_t* s_row, const int32_t* s_slot, const int32_t* s_len,
    const int32_t* s_idx, const int32_t* s_cnt, const int32_t* s_off,
    const int64_t* s_occ, int64_t n_seeds, int64_t S, int64_t K,
    const PeParams* prm, int32_t q_cap, int32_t t_cap, void** out_handle) {
  Ctx c{text,    n,        seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, &prm->se};
  SeedArrays sd{s_row, s_slot, s_len, s_idx, s_cnt, s_off, s_occ,
                n_seeds, S, K, {}, {}};
  bucket_rows(sd, 4 * B);
  auto* h = new SeHandle();
  h->plans.resize(B);
  h->q_cap = q_cap;
  h->t_cap = t_cap;
  int32_t n_threads = std::max(1, prm->se.n_threads);
  PeOut dummy{};  // never written: plan mode returns before any store
  auto work = [&](int64_t lo, int64_t hi) {
    Scratch s;
    s.bk.q_cap = q_cap;
    s.bk.t_cap = t_cap;
    for (int64_t b = lo; b < hi; ++b)
      align_one_pe(c, *prm, s, sd, m1f + b * M, m1r + b * M, m2f + b * M,
                   m2r + b * M, len1[b], len2[b], B, b, dummy, MODE_PLAN,
                   &h->plans[b]);
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
  int64_t total = 0;
  for (auto& pl : h->plans) total += (int64_t)pl.jobs.size();
  if (g_prof.on.load(std::memory_order_relaxed)) g_prof.jobs_n += total;
  h->alljobs.reserve(total);
  for (auto& pl : h->plans) {
    pl.job_off = (int64_t)h->alljobs.size();
    h->alljobs.insert(h->alljobs.end(), pl.jobs.begin(), pl.jobs.end());
  }
  *out_handle = h;
  return total;
}

int monitpu_postseed_pe_resolve(
    void* handle, const int8_t* text, int64_t n, const int64_t* seq_starts,
    int32_t nseq, const int64_t* lift_hs, const int64_t* lift_rs,
    const uint8_t* lift_ins, const int64_t* lift_se, int64_t n_lift,
    const int8_t* m1f, const int8_t* m1r, const int8_t* m2f,
    const int8_t* m2r, const int32_t* len1, const int32_t* len2, int64_t B,
    int64_t M, const PeParams* prm, const int32_t* j_mqe,
    const int32_t* j_mqe_t, const int32_t* j_corner, int32_t* o_flag,
    int32_t* o_rname, int64_t* o_pos, int32_t* o_as, int32_t* o_zs,
    int32_t* o_nm, int32_t* o_rlen, uint32_t* o_cigar, int32_t* o_ncigar,
    char* o_md, int32_t* o_lift_rname, int64_t* o_lift_pos,
    uint32_t* o_lift_cigar, int32_t* o_lift_ncigar, char* o_lift_md,
    int32_t* o_lift_nm, int32_t* o_lift_rlen, uint8_t* o_unmapped_lft,
    int32_t* o_alt_rname, int64_t* o_alt_pos, int32_t* o_alt_score,
    int32_t* o_nalt, int32_t* o_chains_skipped, int32_t* o_mapq,
    int64_t* o_pnext, int64_t* o_tlen, int8_t* o_strand,
    uint8_t* o_aligned, uint8_t* o_chained, uint8_t* o_orphan_rec,
    uint8_t* o_learn_ok, int64_t* o_learn_dist) {
  auto* h = (SeHandle*)handle;
  Ctx c{text,    n,        seq_starts, nseq,   lift_hs,
        lift_rs, lift_ins, lift_se,    n_lift, &prm->se};
  SeedArrays sd{};  // unused in resolve (plans carry mems/chains)
  SeOut se_out{o_flag,       o_rname,       o_pos,        o_as,
               o_zs,         o_nm,          o_rlen,       o_cigar,
               o_ncigar,     o_md,          o_lift_rname, o_lift_pos,
               o_lift_cigar, o_lift_ncigar, o_lift_md,    o_lift_nm,
               o_lift_rlen,  o_unmapped_lft, o_alt_rname, o_alt_pos,
               o_alt_score,  o_nalt,        o_chains_skipped};
  PeOut po{se_out,   o_mapq,    o_pnext,      o_tlen,     o_strand,
           o_aligned, o_chained, o_orphan_rec, o_learn_ok, o_learn_dist};
  int32_t n_threads = std::max(1, prm->se.n_threads);
  std::vector<int64_t> mism(std::max(n_threads, 1), 0);
  auto work = [&](int32_t ti, int64_t lo, int64_t hi) {
    Scratch s;
    s.bk.q_cap = h->q_cap;
    s.bk.t_cap = h->t_cap;
    s.bk.jobs = h->alljobs.data();
    s.bk.mqe = j_mqe;
    s.bk.mqe_t = j_mqe_t;
    s.bk.corner = j_corner;
    for (int64_t b = lo; b < hi; ++b)
      align_one_pe(c, *prm, s, sd, m1f + b * M, m1r + b * M, m2f + b * M,
                   m2r + b * M, len1[b], len2[b], B, b, po, MODE_RESOLVE,
                   &h->plans[b]);
    mism[ti] = s.bk.mismatch;
  };
  if (n_threads == 1 || B <= 1) {
    work(0, 0, B);
  } else {
    std::vector<std::thread> pool;
    int64_t chunk = (B + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(B, lo + chunk);
      if (lo >= hi) break;
      pool.emplace_back(work, t, lo, hi);
    }
    for (auto& t : pool) t.join();
  }
  int64_t total_mism = 0;
  for (int64_t m : mism) total_mism += m;
  return total_mism > 0 ? 1 : 0;
}

}  // extern "C"
