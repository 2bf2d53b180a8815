// Shared extz-semantics DP lane (see ksw2.cpp for the full contract
// documentation). Included by ksw2.cpp (ctypes oracle entry points) and
// runtime.cpp (the native post-seed runtime).
#pragma once

#include <cstdint>
#include <vector>
#include <algorithm>

namespace monitpu {

constexpr int32_t EXTZ_NEG = -(1 << 28);
constexpr int32_t FLAG_SCORE_ONLY = 1;  // KSW_EZ_SCORE_ONLY
constexpr int32_t FLAG_EXTZ_ONLY = 2;   // KSW_EZ_EXTZ_ONLY

inline int32_t nscore(int8_t a, int8_t b, int32_t sm, int32_t sx) {
  if (a == 0 || a == 5 || b == 0 || b == 5) return 0;  // N/SEP: matrix 0
  return a == b ? sm : -sx;
}

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
inline void extz_lane(const int8_t* q, int32_t qlen, const int8_t* t,
                      int32_t tlen, int32_t sm, int32_t sx, int32_t go,
                      int32_t ge, int32_t flags, std::vector<int32_t>& H,
                      std::vector<int32_t>& F, std::vector<uint8_t>& dirs,
                      uint32_t* cigar, int64_t cigar_cap, ExtzOut* out) {
  out->n_cigar = 0;
  const bool want_cigar = !(flags & FLAG_SCORE_ONLY) && cigar != nullptr;
  // degenerate shapes: pure-gap closed forms (the reference never calls
  // ksw2 with an empty side; kept for safety)
  if (qlen == 0 || tlen == 0) {
    out->mqe = (tlen == 0 && qlen > 0) ? -(go + qlen * ge) : 0;
    out->mqe_t = -1;
    out->score = (qlen == 0 && tlen == 0)
                     ? 0
                     : -(go + (qlen == 0 ? tlen : qlen) * ge);
    if (want_cigar && !(flags & FLAG_EXTZ_ONLY)) {
      if (qlen > 0) {
        cigar[0] = (uint32_t(qlen) << 4) | 1;
        out->n_cigar = 1;
      } else if (tlen > 0) {
        cigar[0] = (uint32_t(tlen) << 4) | 2;
        out->n_cigar = 1;
      }
    } else if (want_cigar && qlen > 0) {
      cigar[0] = (uint32_t(qlen) << 4) | 1;
      out->n_cigar = 1;
    }
    return;
  }

  H.assign(tlen + 1, 0);
  F.assign(tlen + 1, EXTZ_NEG);
  for (int32_t j = 0; j < tlen; ++j) H[j + 1] = -(go + (j + 1) * ge);
  if (want_cigar) dirs.assign((int64_t)qlen * tlen, 0);

  int32_t mqe = EXTZ_NEG, mqe_t = -1, corner = EXTZ_NEG;
  for (int32_t i = 0; i < qlen; ++i) {
    int32_t h_diag = (i == 0) ? 0 : -(go + i * ge);  // H[i-1][-1]
    int32_t h_left = -(go + (i + 1) * ge);           // H[i][-1]
    int32_t e = EXTZ_NEG;                            // E[i][-1]
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
      if (f >= h) {
        d = 2;
        h = f;
      }
      if (want_cigar)
        drow[j] = d | (f_ext >= f_open ? 8 : 0) | (e_ext >= e_open ? 4 : 0);
      h_diag = H[j + 1];
      H[j + 1] = h;
      F[j + 1] = f;
      h_left = h;
    }
    if (i == qlen - 1) {
      for (int32_t j = 0; j < tlen; ++j)
        if (H[j + 1] > mqe) {
          mqe = H[j + 1];
          mqe_t = j;
        }
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
    if (state == 0) {
      rev.push_back(0);
      --i;
      --j;
    } else if (state == 1) {
      rev.push_back(2);
      if (!(d & 4)) state = 0;
      --j;
    } else {
      rev.push_back(1);
      if (!(d & 8)) state = 0;
      --i;
    }
  }
  while (i >= 0) {
    rev.push_back(1);
    --i;
  }  // leading query insertion
  while (j >= 0) {
    rev.push_back(2);
    --j;
  }  // leading target deletion
  int32_t n = 0;
  for (int64_t k = (int64_t)rev.size() - 1; k >= 0; --k)
    push_op(cigar, n, cigar_cap, rev[k]);
  out->n_cigar = n;
}

// ---- banded extz with an optimality certificate ----
//
// The reference pays a full O(qlen*tlen) ksw_extz2_sse per extension
// (aligner_ksw2.hpp:2812,2844,2965,2988); for well-matching sequences
// the optimal path stays within a narrow diagonal band. This variant
// computes only a parallelogram band of half-width b and PROVES the
// result exact before returning it:
//
//   Any path that touches a cell deviating >= b+1 from the band's
//   diagonal range carries a gap run of length >= b+1, so its score is
//   <= UB(b) := min(qlen,tlen)*sm - go - (b+1)*ge.  If the banded
//   result S_b > UB(b), then (a) no out-of-band path can beat it, so
//   S_b is the true optimum, and (b) every optimal path stays strictly
//   inside the band.  With all on-path DP values exact and competitor
//   values only ever shrunk by banding, every forward-pass argmax
//   (H-source, E/F extend-vs-open) resolves identically to the full
//   DP — each comparison prefers the on-path candidate under
//   shrinkage — so the recorded traceback is bit-identical too.
//
// On certificate failure the band grows to the slack-derived
// requirement (guaranteed to certify in one more pass) and degenerates
// to the full extz_lane when the band would cover the matrix.  Callers
// declare which outputs they consume via `need` so the certificate
// covers exactly those.
constexpr int32_t NEED_MQE = 1;     // mqe / mqe_t (EXTZ extension use)
constexpr int32_t NEED_CORNER = 2;  // corner score (global use)

inline void extz_lane_banded(const int8_t* q, int32_t qlen, const int8_t* t,
                             int32_t tlen, int32_t sm, int32_t sx,
                             int32_t go, int32_t ge, int32_t flags,
                             int32_t need, int32_t band0,
                             std::vector<int32_t>& H, std::vector<int32_t>& F,
                             std::vector<uint8_t>& dirs, uint32_t* cigar,
                             int64_t cigar_cap, ExtzOut* out) {
  const bool want_cigar = !(flags & FLAG_SCORE_ONLY) && cigar != nullptr;
  if (want_cigar && !(flags & FLAG_EXTZ_ONLY)) need |= NEED_CORNER;
  if (qlen <= 0 || tlen <= 0 || ge <= 0 || need == 0) {
    extz_lane(q, qlen, t, tlen, sm, sx, go, ge, flags, H, F, dirs, cigar,
              cigar_cap, out);
    return;
  }
  const int32_t delta = tlen - qlen;
  const int32_t lo_d0 = (need & NEED_CORNER) ? std::min(0, delta) : 0;
  const int32_t hi_d0 = (need & NEED_CORNER) ? std::max(0, delta) : 0;
  const int64_t Mg = (int64_t)std::min(qlen, tlen) * sm;
  int32_t b = band0 < 2 ? 2 : band0;
  // NEED_MQE: the last row's band must reach column range [0, tlen)
  if ((need & NEED_MQE) && qlen - tlen > b) b = qlen - tlen + 2;
  for (;;) {
    const int32_t lo_d = lo_d0 - b, hi_d = hi_d0 + b;
    const int64_t bandW = (int64_t)(hi_d - lo_d) + 1;
    if (bandW >= tlen) break;  // full DP is as cheap
    H.assign(tlen + 1, 0);
    F.assign(tlen + 1, EXTZ_NEG);
    for (int32_t j = 0; j < tlen; ++j) H[j + 1] = -(go + (j + 1) * ge);
    if (want_cigar) dirs.assign((int64_t)qlen * bandW, 0);
    int32_t mqe = EXTZ_NEG, mqe_t = -1, corner = EXTZ_NEG;
    for (int32_t i = 0; i < qlen; ++i) {
      const int32_t lo = std::max(0, i + lo_d);
      const int32_t hi = std::min(tlen - 1, i + hi_d);
      if (lo > hi) continue;
      int32_t h_diag, h_left;
      if (lo == 0) {
        h_diag = (i == 0) ? 0 : -(go + i * ge);
        h_left = -(go + (i + 1) * ge);
      } else {
        h_diag = H[lo];  // prev row, column lo-1
        h_left = EXTZ_NEG;
      }
      int32_t e = EXTZ_NEG;
      uint8_t* drow = want_cigar ? dirs.data() + (int64_t)i * bandW : nullptr;
      for (int32_t j = lo; j <= hi; ++j) {
        int32_t f_ext = F[j + 1] - ge, f_open = H[j + 1] - go - ge;
        int32_t f = std::max(f_ext, f_open);
        int32_t e_ext = e - ge, e_open = h_left - go - ge;
        e = std::max(e_ext, e_open);
        int32_t m = h_diag + nscore(q[i], t[j], sm, sx);
        uint8_t d = (m > e) ? 0 : 1;
        int32_t h = std::max(m, e);
        if (f >= h) {
          d = 2;
          h = f;
        }
        if (want_cigar)
          drow[j - lo] = d | (f_ext >= f_open ? 8 : 0) | (e_ext >= e_open ? 4 : 0);
        h_diag = H[j + 1];
        H[j + 1] = h;
        F[j + 1] = f;
        h_left = h;
      }
      // next row reaches one column further right than this one did
      if (hi + 2 <= tlen) {
        H[hi + 2] = EXTZ_NEG;
        F[hi + 2] = EXTZ_NEG;
      }
      if (i == qlen - 1) {
        for (int32_t j = lo; j <= hi; ++j)
          if (H[j + 1] > mqe) {
            mqe = H[j + 1];
            mqe_t = j;
          }
        corner = (hi == tlen - 1) ? H[tlen] : EXTZ_NEG;
      }
    }
    const int64_t ub = Mg - go - (int64_t)(b + 1) * ge;
    bool ok = true;
    if ((need & NEED_MQE) && !(mqe > ub)) ok = false;
    if ((need & NEED_CORNER) && !(corner > ub)) ok = false;
    if (ok) {
      out->mqe = mqe;
      out->mqe_t = mqe_t;
      out->score = corner;
      out->n_cigar = 0;
      if (!want_cigar) return;
      int32_t ti = qlen - 1;
      int32_t tj = (flags & FLAG_EXTZ_ONLY) ? mqe_t : tlen - 1;
      std::vector<uint32_t> rev;
      rev.reserve(qlen + tlen);
      int state = 0;
      bool in_band = true;
      while (ti >= 0 && tj >= 0) {
        const int32_t lo = std::max(0, ti + lo_d);
        const int32_t hi = std::min(tlen - 1, ti + hi_d);
        if (tj < lo || tj > hi) {  // cannot happen when certified; be safe
          in_band = false;
          break;
        }
        uint8_t d = dirs[(int64_t)ti * bandW + (tj - lo)];
        if (state == 0) state = d & 3;
        if (state == 0) {
          rev.push_back(0);
          --ti;
          --tj;
        } else if (state == 1) {
          rev.push_back(2);
          if (!(d & 4)) state = 0;
          --tj;
        } else {
          rev.push_back(1);
          if (!(d & 8)) state = 0;
          --ti;
        }
      }
      if (in_band) {
        while (ti >= 0) {
          rev.push_back(1);
          --ti;
        }
        while (tj >= 0) {
          rev.push_back(2);
          --tj;
        }
        int32_t n = 0;
        for (int64_t k = (int64_t)rev.size() - 1; k >= 0; --k)
          push_op(cigar, n, cigar_cap, rev[k]);
        out->n_cigar = n;
        return;
      }
      break;  // defensive: fall through to full DP
    }
    // grow so that UB(b') < the score we already achieved — certifies
    // in one more pass (new score can only be >= the banded one)
    int64_t s_known = EXTZ_NEG;
    if (need & NEED_MQE) s_known = mqe;
    if (need & NEED_CORNER)
      s_known = (s_known == EXTZ_NEG) ? corner
                                      : std::min<int64_t>(s_known, corner);
    int64_t b_req = (s_known <= EXTZ_NEG / 2)
                        ? (int64_t)tlen
                        : (Mg - go - s_known) / ge + 1;
    b = (int32_t)std::min<int64_t>(std::max<int64_t>(2LL * b, b_req),
                                   (int64_t)tlen);
  }
  extz_lane(q, qlen, t, tlen, sm, sx, go, ge, flags, H, F, dirs, cigar,
            cigar_cap, out);
}

}  // namespace monitpu
