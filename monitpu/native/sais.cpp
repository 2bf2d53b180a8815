// monitpu native helpers: SA-IS suffix array construction + Kasai LCP.
//
// Role: offline index construction substrate. The reference builds its
// index through the PFP subprocess toolchain (prefix-free parsing +
// pfp-thresholds, see /root/reference/pipeline/moni.in:54-80) because it
// targets texts far larger than RAM; we build directly with linear-time
// induced sorting, which is exact and fast at chromosome/pangenome scale
// on a TPU host. Own implementation of the standard SA-IS algorithm
// (Nong, Zhang & Chan 2009), not derived from any reference code.
//
// Build: g++ -O3 -march=native -shared -fPIC sais.cpp -o libmonitpu.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// bucket boundaries for chars 0..K-1; end=true -> bucket ends (exclusive)
template <typename CharT, typename IdxT>
static void get_buckets(const CharT* s, IdxT n, IdxT K, IdxT* bkt, bool end) {
  std::fill(bkt, bkt + K, (IdxT)0);
  for (IdxT i = 0; i < n; i++) bkt[s[i]]++;
  IdxT sum = 0;
  for (IdxT c = 0; c < K; c++) {
    sum += bkt[c];
    bkt[c] = end ? sum : sum - bkt[c];
  }
}

template <typename CharT, typename IdxT>
static void induce_L(const std::vector<bool>& stype, IdxT* SA, const CharT* s,
                     IdxT* bkt, IdxT n, IdxT K) {
  get_buckets(s, n, K, bkt, false);
  for (IdxT i = 0; i < n; i++) {
    IdxT j = SA[i];
    if (j > 0 && !stype[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
}

template <typename CharT, typename IdxT>
static void induce_S(const std::vector<bool>& stype, IdxT* SA, const CharT* s,
                     IdxT* bkt, IdxT n, IdxT K) {
  get_buckets(s, n, K, bkt, true);
  for (IdxT i = n - 1; i >= 0; i--) {
    IdxT j = SA[i];
    if (j > 0 && stype[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }
}

// SA-IS. Requires s[n-1] == 0, unique in s, n >= 1.
template <typename CharT, typename IdxT>
static void sais_core(const CharT* s, IdxT* SA, IdxT n, IdxT K) {
  if (n == 1) { SA[0] = 0; return; }

  std::vector<bool> stype(n);
  stype[n - 1] = true;
  stype[n - 2] = false;
  for (IdxT i = n - 3; i >= 0; i--)
    stype[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && stype[i + 1]);

  auto is_lms = [&](IdxT i) { return i > 0 && stype[i] && !stype[i - 1]; };

  std::vector<IdxT> bkt(K);

  // step 1: place LMS suffixes at bucket ends, induce-sort LMS substrings
  std::fill(SA, SA + n, (IdxT)-1);
  get_buckets(s, n, K, bkt.data(), true);
  for (IdxT i = n - 1; i >= 1; i--)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce_L(stype, SA, s, bkt.data(), n, K);
  induce_S(stype, SA, s, bkt.data(), n, K);

  // compact sorted LMS positions into SA[0..n1)
  IdxT n1 = 0;
  for (IdxT i = 0; i < n; i++)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];

  // name LMS substrings in SA[n1..n)
  std::fill(SA + n1, SA + n, (IdxT)-1);
  IdxT name = 0;
  IdxT prev = -1;
  for (IdxT i = 0; i < n1; i++) {
    IdxT pos = SA[i];
    bool diff = (prev < 0);
    if (!diff) {
      for (IdxT d = 0;; d++) {
        if (s[pos + d] != s[prev + d] ||
            stype[pos + d] != stype[prev + d]) {
          diff = true;
          break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
          diff = !(is_lms(pos + d) && is_lms(prev + d));
          break;
        }
        // sentinel (unique, at n-1) terminates every walk: the sentinel
        // position is LMS, so the branch above always fires before overrun.
      }
    }
    if (diff) { name++; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  // compact names to the tail
  for (IdxT i = n - 1, j = n - 1; i >= n1; i--)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // step 2: recurse if names not unique
  IdxT* s1 = SA + n - n1;
  if (name < n1) {
    sais_core<IdxT, IdxT>(s1, SA, n1, name);
  } else {
    for (IdxT i = 0; i < n1; i++) SA[s1[i]] = i;
  }

  // step 3: induce full SA from sorted LMS order
  // recover LMS positions in text order into s1
  {
    IdxT j = 0;
    for (IdxT i = 1; i < n; i++)
      if (is_lms(i)) s1[j++] = i;
  }
  for (IdxT i = 0; i < n1; i++) SA[i] = s1[SA[i]];  // map ranks to positions
  std::fill(SA + n1, SA + n, (IdxT)-1);
  get_buckets(s, n, K, bkt.data(), true);
  for (IdxT i = n1 - 1; i >= 0; i--) {
    IdxT j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  induce_L(stype, SA, s, bkt.data(), n, K);
  induce_S(stype, SA, s, bkt.data(), n, K);
}

}  // namespace

extern "C" {

// Suffix array of uint8 text (values 0..K-1, arbitrary; no sentinel
// requirement — an internal +1 shifted copy with appended 0 is used).
// sa_out must have room for n entries. Returns 0 on success.
int monitpu_sais_u8(const uint8_t* s, int64_t n, int32_t* sa_out) {
  if (n <= 0 || n >= INT32_MAX - 1) return -1;
  int32_t m = (int32_t)n + 1;
  std::vector<uint8_t> t(m);
  for (int64_t i = 0; i < n; i++) t[i] = s[i] + 1;
  t[n] = 0;
  std::vector<int32_t> SA(m);
  sais_core<uint8_t, int32_t>(t.data(), SA.data(), m, 257);
  // SA[0] is the appended sentinel suffix (position n); drop it.
  std::memcpy(sa_out, SA.data() + 1, sizeof(int32_t) * n);
  return 0;
}

// 64-bit variant for texts beyond 2^31 (the reference's pipeline
// switches to 64-bit pfp_thresholds binaries the same way when the
// parse crosses 2^31, /root/reference/pipeline/moni.in:195-204).
// sa_buf must hold n+1 entries and is used IN PLACE (no internal SA
// copy — at pangenome scale the former extra vector was 8 B/position
// of avoidable peak RSS); on return sa_buf[0..n) is the suffix array.
int monitpu_sais_u8_64(const uint8_t* s, int64_t n, int64_t* sa_buf) {
  if (n <= 0) return -1;
  int64_t m = n + 1;
  std::vector<uint8_t> t(m);
  for (int64_t i = 0; i < n; i++) t[i] = s[i] + 1;
  t[n] = 0;
  sais_core<uint8_t, int64_t>(t.data(), sa_buf, m, (int64_t)257);
  // sa_buf[0] is the appended sentinel suffix (position n); drop it.
  std::memmove(sa_buf, sa_buf + 1, sizeof(int64_t) * n);
  return 0;
}

int monitpu_kasai_u8_64(const uint8_t* s, const int64_t* sa, int64_t n,
                        int64_t* lcp_out) {
  if (n <= 0) return -1;
  std::vector<int64_t> rank(n);
  for (int64_t i = 0; i < n; i++) rank[sa[i]] = i;
  int64_t h = 0;
  lcp_out[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t ri = rank[i];
    if (ri > 0) {
      int64_t j = sa[ri - 1];
      while (i + h < n && j + h < n && s[i + h] == s[j + h]) h++;
      lcp_out[ri] = h;
      if (h > 0) h--;
    } else {
      h = 0;
    }
  }
  return 0;
}

// Kasai LCP: lcp_out[i] = lce(s[sa[i-1]..], s[sa[i]..]), lcp_out[0] = 0.
int monitpu_kasai_u8(const uint8_t* s, const int32_t* sa, int64_t n,
                     int32_t* lcp_out) {
  if (n <= 0) return -1;
  std::vector<int32_t> rank(n);
  for (int64_t i = 0; i < n; i++) rank[sa[i]] = (int32_t)i;
  int64_t h = 0;
  lcp_out[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    int32_t ri = rank[i];
    if (ri > 0) {
      int64_t j = sa[ri - 1];
      while (i + h < n && j + h < n && s[i + h] == s[j + h]) h++;
      lcp_out[ri] = (int32_t)h;
      if (h > 0) h--;
    } else {
      h = 0;
    }
  }
  return 0;
}

// In-place PLCP from the Phi array: phi[i] = text start of the suffix
// ranked just above suffix i (or -1 where rank(i) == 0). Overwrites
// phi with PLCP. The h-decrement amortization is the same as Kasai's,
// but in TEXT order over a streamed-in Phi — the streaming index
// build's replacement for monitpu_kasai_u8_64, whose rank array cost
// 8 B/position of peak RSS (index/stream_build.py).
int monitpu_plcp_u8(const uint8_t* s, int64_t n, int64_t* phi) {
  int64_t h = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t j = phi[i];
    if (j < 0) {
      phi[i] = 0;
      h = 0;
      continue;
    }
    while (i + h < n && j + h < n && s[i + h] == s[j + h]) h++;
    phi[i] = h;
    if (h > 0) h--;
  }
  return 0;
}

// First argmin of lcp over row segments [lo_k, hi_k): the threshold
// position extractor (one threshold per consecutive same-char run
// pair). Replaces the lcp*n+i composite-key trick, which (a) needs
// n^2 < 2^63 and (b) materializes two n-sized int64 temporaries —
// this is O(total covered rows) with zero allocation, so the build's
// ceiling is RAM, not the key width (VERDICT r3 item 4).
int monitpu_seg_first_argmin_64(const int64_t* lcp, int64_t n,
                                const int64_t* lo, const int64_t* hi,
                                int64_t nseg, int64_t* out_pos) {
  for (int64_t k = 0; k < nseg; ++k) {
    int64_t a = lo[k], b = hi[k];
    if (a < 0 || b > n || a >= b) return 1;
    int64_t best = lcp[a], pos = a;
    for (int64_t i = a + 1; i < b; ++i)
      if (lcp[i] < best) {
        best = lcp[i];
        pos = i;
      }
    out_pos[k] = pos;
  }
  return 0;
}

}  // extern "C"
