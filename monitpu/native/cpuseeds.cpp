// monitpu CPU seed stage: matching statistics + MEM extraction +
// Phi-walk occurrence enumeration with seed halving, emitting the same
// packed seed format as the TPU stage (ops/occs.pack_seeds).
//
// Role: (a) the measured CPU baseline demanded by BASELINE.md — a
// faithful, multithreaded CPU implementation of the whole seed stage
// (reference hot loops: include/ms/moni.hpp:567-624 backward search,
// include/aligner/seed_finder.hpp:126-329 MEM assembly + walks), so
// reads/s can be compared honestly against the TPU pipeline on the
// same data through the same post-seed runtime; (b) a complete CPU
// fallback for machines without an accelerator.
//
// Semantics mirror monitpu/index/refimpl.py + oracle/se.py find_mems /
// populate_seeds: threshold-directed LF steps, repeated-pointer LCE
// skip, N-run suppression, min_len gate, walk-based occurrence
// enumeration with the half-seed split riding the parent walks' far
// endpoints. Occurrence lists are capped at max_occs per seed (the
// same knob as the device walks).
//
// Build: part of libmonitpu.so (see sais.py builder).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int SIGMA = 6;

// I = index position int type: int32 normally, int64 beyond 2^31
// (the reference's 32/64-bit binary split, pipeline/moni.in:195-204)
template <typename I>
struct CpuIndex {
  const int8_t* text;
  int64_t n;
  const int64_t* F;          // [SIGMA + 1]
  const I* run_starts;       // [r]
  const int8_t* run_heads;
  const I* block_run;        // [ceil(n/64) + 1]
  const I* clen_at_run;      // [r, SIGMA]
  const I* run_crank;        // [r, SIGMA]
  const I* thr_cnt_run;      // [r, SIGMA]
  const I* thr_pos_run;      // [r, SIGMA]
  const I* csamples_start;   // [SIGMA, Rc]
  const I* csamples_last;
  int64_t r, Rc;
  const I *phi_z, *phi_w, *phi_wl;
  int64_t n_phi;
  const I *piv_z, *piv_w, *piv_wl;
  int64_t n_piv;
  int64_t sa0, sa_last;
};

template <typename I>
inline int64_t run_of(const CpuIndex<I>& ix, int64_t pos) {
  int64_t j = ix.block_run[pos >> 6];
  while (j + 1 < ix.r && ix.run_starts[j + 1] <= pos) ++j;
  return j;
}

// MS pointers (refimpl.ms_pointers; moni.hpp:567-624 semantics)
template <typename I>
void ms_pointers(const CpuIndex<I>& ix, const int8_t* pat, int32_t m,
                 int64_t* ptr) {
  int64_t pos = ix.n - 1;
  int64_t sample = ix.sa_last;
  for (int32_t i = m - 1; i >= 0; --i) {
    int c = pat[i];
    int64_t count_c = ix.F[c + 1] - ix.F[c];
    int64_t j = run_of(ix, pos);
    int head = ix.run_heads[j];
    int64_t rank_c_pos = ix.clen_at_run[j * SIGMA + c];
    if (head == c) rank_c_pos += pos - ix.run_starts[j];
    if (count_c == 0) {
      sample = 0;
      pos = std::min(ix.F[c], ix.n - 1);
    } else if (head == c) {
      --sample;
      pos = ix.F[c] + rank_c_pos;
    } else {
      int64_t rank_runs = ix.run_crank[j * SIGMA + c];
      int64_t thr_c = ix.thr_cnt_run[j * SIGMA + c] +
                      (ix.thr_pos_run[j * SIGMA + c] <= pos ? 1 : 0);
      if (rank_runs > thr_c) {
        sample = int64_t(ix.csamples_last[c * ix.Rc + rank_runs - 1]) - 1;
        pos = ix.F[c] + rank_c_pos - 1;
      } else {
        sample = int64_t(ix.csamples_start[c * ix.Rc + rank_runs]) - 1;
        pos = ix.F[c] + rank_c_pos;
      }
    }
    ptr[i] = sample;
  }
}

template <typename I>
inline void phi_q(const I* z, const I* w, const I* wl,
                  int64_t nz, int64_t q, int64_t* out, int64_t* lcp) {
  int64_t k = std::lower_bound(z, z + nz, I(q)) - z;
  int64_t zk = z[k];
  *out = int64_t(w[k]) - (zk - q);
  *lcp = int64_t(wl[k]) + (zk - q);
}

struct SeedRec {
  int32_t slot, len, idx, cnt;
  std::vector<int64_t> occs;
};

// find_MEM_above/below (seed_finder.hpp:169-242): walk while LCP >=
// len, capped at max_occs total per seed. Returns far endpoints.
template <typename I>
void enumerate_occs(const CpuIndex<I>& ix, int64_t up_start,
                    int64_t down_start, int32_t len, bool include_start,
                    int32_t max_occs, std::vector<int64_t>& occs,
                    int64_t* far_up, int64_t* far_dn) {
  occs.clear();
  if (include_start) occs.push_back(up_start);
  int64_t cur = up_start;
  while (cur != ix.sa0 && (int32_t)occs.size() < max_occs) {
    int64_t prev, lcp;
    phi_q(ix.phi_z, ix.phi_w, ix.phi_wl, ix.n_phi, cur, &prev, &lcp);
    if (lcp < len) break;
    occs.push_back(prev);
    cur = prev;
  }
  *far_up = cur;
  cur = down_start;
  while (cur != ix.sa_last && (int32_t)occs.size() < max_occs) {
    int64_t nxt, lcp;
    phi_q(ix.piv_z, ix.piv_w, ix.piv_wl, ix.n_piv, cur, &nxt, &lcp);
    if (lcp < len) break;
    occs.push_back(nxt);
    cur = nxt;
  }
  *far_dn = cur;
}

// One lane: MS -> MEMs -> occurrence walks + halving. Fills per-lane
// seed records with lane-local slots parents [0,np) / left [np,2np) /
// right [2np,3np); returns np (the lane's parent count).
template <typename I>
int32_t lane_seeds(const CpuIndex<I>& ix, const int8_t* pat, int32_t m,
                   int32_t min_len, int32_t max_occs,
                   std::vector<SeedRec>& out, std::vector<int64_t>& ptr) {
  out.clear();
  ptr.resize(m);
  ms_pointers(ix, pat, m, ptr.data());
  // find_mems (oracle/se.py:91-112)
  struct Par {
    int64_t pos;
    int32_t len, idx;
    int64_t far_up, far_dn;
  };
  std::vector<Par> parents;
  {
    int32_t l = 0, pl = 0, n_ns = 0;
    int64_t prev_pos_plus_one = ix.n + 1;
    for (int32_t i = 0; i < m; ++i) {
      int64_t pos = ptr[i];
      while (pos != prev_pos_plus_one && i + l < m && pos + l < ix.n &&
             pat[i + l] == ix.text[pos + l]) {
        n_ns = pat[i + l] == 5 ? n_ns + 1 : 0;
        ++l;
      }
      if (l >= pl && n_ns < l && l >= min_len)
        parents.push_back({pos, l, i, 0, 0});
      pl = l;
      l = l > 0 ? l - 1 : 0;
      prev_pos_plus_one = pos + 1;
    }
  }
  // parent walks (slot = parent index)
  int32_t K = int32_t(parents.size());
  std::vector<int64_t> occs;
  for (int32_t p = 0; p < K; ++p) {
    Par& pa = parents[p];
    enumerate_occs(ix, pa.pos, pa.pos, pa.len, true, max_occs, occs,
                   &pa.far_up, &pa.far_dn);
    SeedRec r{p, pa.len, pa.idx, int32_t(occs.size()), occs};
    out.push_back(std::move(r));
  }
  // halves (populate_seed split, seed_finder.hpp:279-318): left walks
  // from the parent's far endpoints, right re-walks from pos + ll.
  // Documented divergence (shared with the TPU kernel): the endpoints
  // are the raw walk positions; the reference uses occs.back() AFTER
  // the per-genome n_seeds_thr filter popped entries, which differs
  // only when a seed exceeds n_seeds_thr (=1000) occurrences in one
  // genome or the max_occs cap fired (both counted upstream)
  for (int32_t p = 0; p < K; ++p) {
    const Par& pa = parents[p];
    if (pa.len < 2 * min_len) continue;
    int32_t ll = pa.len >> 1;
    int64_t fu, fd;
    int64_t lower_eff = pa.far_dn != pa.pos ? pa.far_dn : pa.far_up;
    enumerate_occs(ix, pa.far_up, lower_eff, ll, true, max_occs, occs,
                   &fu, &fd);
    out.push_back({K + p, ll, pa.idx, int32_t(occs.size()), occs});
    enumerate_occs(ix, pa.pos + ll, pa.pos + ll, pa.len - ll, true,
                   max_occs, occs, &fu, &fd);
    out.push_back(
        {2 * K + p, pa.len - ll, pa.idx + ll, int32_t(occs.size()), occs});
  }
  return K;
}

template <typename I>
int cpu_seeds_core(
    const CpuIndex<I>& ix,
    const int8_t* lanes, const int32_t* lens, int64_t R, int64_t M,
    int32_t min_len, int32_t max_occs, int32_t n_threads,
    int32_t* o_row, int32_t* o_slot, int32_t* o_len, int32_t* o_idx,
    int32_t* o_cnt, int32_t* o_off, int64_t seed_cap, int64_t* o_occ,
    int64_t occ_cap, int64_t* out_n_seeds, int64_t* out_n_occ,
    int64_t* out_K) {
  std::vector<std::vector<SeedRec>> per_row(R);
  std::vector<int32_t> row_np(R, 0);
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> ptr;
    for (int64_t row = lo; row < hi; ++row)
      row_np[row] = lane_seeds(ix, lanes + row * M, lens[row], min_len,
                               max_occs, per_row[row], ptr);
  };
  if (n_threads == 1 || R <= 1) {
    work(0, R);
  } else {
    std::vector<std::thread> pool;
    int64_t chunk = (R + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min(R, lo + chunk);
      if (lo >= hi) break;
      pool.emplace_back(work, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  // uniform K = max parents in any lane
  int64_t K = 1;
  for (int64_t row = 0; row < R; ++row)
    K = std::max<int64_t>(K, row_np[row]);
  int64_t ns = 0, no = 0;
  for (int64_t row = 0; row < R; ++row) {
    auto& v = per_row[row];
    int64_t np = row_np[row];
    for (auto& s : v) {
      if (ns >= seed_cap || no + s.cnt > occ_cap) {
        *out_n_seeds = seed_cap + 1;  // overflow signal
        *out_n_occ = occ_cap + 1;
        *out_K = K;
        return 0;
      }
      int32_t slot = s.slot;
      if (slot >= 2 * np)
        slot = int32_t(2 * K + (slot - 2 * np));
      else if (slot >= np)
        slot = int32_t(K + (slot - np));
      o_row[ns] = int32_t(row);
      o_slot[ns] = slot;
      o_len[ns] = s.len;
      o_idx[ns] = s.idx;
      o_cnt[ns] = s.cnt;
      o_off[ns] = int32_t(no);
      memcpy(o_occ + no, s.occs.data(), s.cnt * sizeof(int64_t));
      no += s.cnt;
      ++ns;
    }
  }
  *out_n_seeds = ns;
  *out_n_occ = no;
  *out_K = K;
  return 0;
}

}  // namespace

extern "C" {

// Lanes int8[R, M] (each row one oriented read), lens int32[R].
// Emits packed seeds (row, slot, len, idx, cnt, off, occ) with a
// UNIFORM parent capacity K across the batch (returned via *out_K;
// slots renumbered so halves sit at [K,2K)/[2K,3K)). The occ pool is
// int64 (native runtime convention); index arrays are int32 here and
// int64 in the _w64 variant.
int monitpu_cpu_seeds(
    const int8_t* text, int64_t n, const int64_t* F,
    const int32_t* run_starts, const int8_t* run_heads,
    const int32_t* block_run, const int32_t* clen_at_run,
    const int32_t* run_crank, const int32_t* thr_cnt_run,
    const int32_t* thr_pos_run, const int32_t* csamples_start,
    const int32_t* csamples_last, int64_t r, int64_t Rc,
    const int32_t* phi_z, const int32_t* phi_w, const int32_t* phi_wl,
    int64_t n_phi, const int32_t* piv_z, const int32_t* piv_w,
    const int32_t* piv_wl, int64_t n_piv, int64_t sa0, int64_t sa_last,
    const int8_t* lanes, const int32_t* lens, int64_t R, int64_t M,
    int32_t min_len, int32_t max_occs, int32_t n_threads,
    int32_t* o_row, int32_t* o_slot, int32_t* o_len, int32_t* o_idx,
    int32_t* o_cnt, int32_t* o_off, int64_t seed_cap, int64_t* o_occ,
    int64_t occ_cap, int64_t* out_n_seeds, int64_t* out_n_occ,
    int64_t* out_K) {
  CpuIndex<int32_t> ix{text,        n,          F,
                       run_starts,  run_heads,  block_run,
                       clen_at_run, run_crank,  thr_cnt_run,
                       thr_pos_run, csamples_start, csamples_last,
                       r,           Rc,         phi_z,
                       phi_w,       phi_wl,     n_phi,
                       piv_z,       piv_w,      piv_wl,
                       n_piv,       sa0,        sa_last};
  return cpu_seeds_core<int32_t>(
      ix, lanes, lens, R, M, min_len, max_occs, n_threads, o_row, o_slot,
      o_len, o_idx, o_cnt, o_off, seed_cap, o_occ, occ_cap, out_n_seeds,
      out_n_occ, out_K);
}

int monitpu_cpu_seeds_w64(
    const int8_t* text, int64_t n, const int64_t* F,
    const int64_t* run_starts, const int8_t* run_heads,
    const int64_t* block_run, const int64_t* clen_at_run,
    const int64_t* run_crank, const int64_t* thr_cnt_run,
    const int64_t* thr_pos_run, const int64_t* csamples_start,
    const int64_t* csamples_last, int64_t r, int64_t Rc,
    const int64_t* phi_z, const int64_t* phi_w, const int64_t* phi_wl,
    int64_t n_phi, const int64_t* piv_z, const int64_t* piv_w,
    const int64_t* piv_wl, int64_t n_piv, int64_t sa0, int64_t sa_last,
    const int8_t* lanes, const int32_t* lens, int64_t R, int64_t M,
    int32_t min_len, int32_t max_occs, int32_t n_threads,
    int32_t* o_row, int32_t* o_slot, int32_t* o_len, int32_t* o_idx,
    int32_t* o_cnt, int32_t* o_off, int64_t seed_cap, int64_t* o_occ,
    int64_t occ_cap, int64_t* out_n_seeds, int64_t* out_n_occ,
    int64_t* out_K) {
  CpuIndex<int64_t> ix{text,        n,          F,
                       run_starts,  run_heads,  block_run,
                       clen_at_run, run_crank,  thr_cnt_run,
                       thr_pos_run, csamples_start, csamples_last,
                       r,           Rc,         phi_z,
                       phi_w,       phi_wl,     n_phi,
                       piv_z,       piv_w,      piv_wl,
                       n_piv,       sa0,        sa_last};
  return cpu_seeds_core<int64_t>(
      ix, lanes, lens, R, M, min_len, max_occs, n_threads, o_row, o_slot,
      o_len, o_idx, o_cnt, o_off, seed_cap, o_occ, occ_cap, out_n_seeds,
      out_n_occ, out_K);
}

}  // extern "C"
