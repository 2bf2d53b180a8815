"""Reference-faithful MEM chaining (oracle side).

Reproduces find_chains (include/aligner/chain.hpp:221-442) and
find_chains_secondary (chain.hpp:442-727) semantics statement-for-
statement over Python data: the minimap2-style DP with max_iter window,
max_pred/t[] pruning, lb advance, the exact beta formula including its
`(c + ilog_l) >> 1` precedence (chain.hpp:332; `+` binds tighter than
`>>` in C++), mate-compatibility mask, chain-end detection,
peak-finding, and shared-prefix backtracking. The secondary variant
runs a second DP lane (f_sec/p_sec) in the same anchor sweep whose
predecessors must not reuse any occurrence position on the current
primary chain (chain.hpp:585-615).

Known divergence from the binary, documented: the reference sorts
anchors and final chains with std::sort (unstable); ties in anchor ref
end or chain score have unspecified order there, we use Python's stable
sort.
"""

from __future__ import annotations

import dataclasses

MATE_1, MATE_2, MATE_F, MATE_RC = 0, 1, 0, 2


@dataclasses.dataclass
class Mem:
    """mem_t (include/aligner/mems.hpp:31-46)."""
    pos: int                 # position in reference
    len: int                 # length
    idx: int                 # position in the read
    mate: int = 0
    rpos: int = 0            # chaining read position (fwd: idx+len-1)
    occs: list = dataclasses.field(default_factory=list)
    total_occ: int = 0
    num_filtered: int = 0
    count_dict: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class Chain:
    """chain_t (chain.hpp:26-52): anchors stored end-first (reverse)."""
    score: int
    mate: int
    paired: bool
    anchors: list            # indices into the anchors list, end-first


@dataclasses.dataclass(frozen=True)
class ChainParams:
    """chain_config_t (chain.hpp:71-79) with the aligner's defaults
    (config_t:121-126)."""
    G: int = 2**62           # LLONG_MAX stand-in
    max_dist_x: int = 500
    max_dist_y: int = 100
    max_iter: int = 10
    max_pred: int = 5
    min_chain_score: int = 40
    min_chain_length: int = 1


def ilog2_32(v: int) -> int:
    """common.hpp:540-545."""
    return v.bit_length() - 1 if v > 0 else 0


def _sorted_anchors(mems):
    anchors = []
    tot_mem_length = 0
    for i, mem in enumerate(mems):
        for j in range(len(mem.occs)):
            anchors.append((i, j))
        tot_mem_length += mem.len * len(mem.occs)
    anchors.sort(key=lambda a: mems[a[0]].occs[a[1]] + mems[a[0]].len - 1)
    return anchors, tot_mem_length


def _find_chain_starts(t, f, p, msc, N, min_chain_score):
    """chain.hpp:143-163 (peak walk) — shared by both variants."""
    starts = []
    for i in range(N):
        if t[i] == 0 and msc[i] > min_chain_score:
            j = i
            while j >= 0 and f[j] < msc[j]:
                j = p[j]
            starts.append((f[j], j))
    return starts


def _backtrack(chain_starts, f, p, mems, anchors, N, cfg, chains):
    """chain.hpp:166-200: shared-prefix splitting backtrack."""
    t = [0] * N
    for start_f, j in chain_starts:
        chain = Chain(score=start_f, mate=mems[anchors[j][0]].mate,
                      paired=False, anchors=[])
        while True:
            chain.paired = chain.paired or (
                chain.mate != mems[anchors[j][0]].mate)
            chain.anchors.append(j)
            t[j] = 1
            j = p[j]
            if not (j >= 0 and t[j] == 0):
                break
        if j < 0:
            if len(chain.anchors) >= cfg.min_chain_length:
                chains.append(chain)
        elif start_f - f[j] >= cfg.min_chain_score:
            if len(chain.anchors) >= cfg.min_chain_length:
                chains.append(chain)


def _chain_dp(mems, anchors, avg_mem_length, cfg, secondary):
    """The anchor sweep (chain.hpp:276-362; dual-lane :503-625).
    Returns (f, p, [f_sec, p_sec])."""
    N = len(anchors)
    f = [0] * N
    p = [0] * N
    msc = [0] * N
    t = [0] * N
    f_sec = [0] * N if secondary else None
    p_sec = [0] * N if secondary else None
    msc_sec = [0] * N if secondary else None
    t_sec = [0] * N if secondary else None

    lb = 0
    for i in range(N):
        mi, oi = anchors[i]
        mem_i = mems[mi]
        x_i = mem_i.occs[oi] + mem_i.len - 1
        y_i = mem_i.rpos
        w_i = mem_i.len
        mate_i = mem_i.mate

        max_f = w_i
        max_j = -1
        max_sec_f = w_i
        max_sec_j = -1
        n_pred = 0
        if i - lb > cfg.max_iter:
            lb = i - cfg.max_iter
        j = i - 1
        while j >= lb:
            mj, oj = anchors[j]
            mem_j = mems[mj]
            x_j = mem_j.occs[oj] + mem_j.len - 1
            y_j = mem_j.rpos
            mate_j = mem_j.mate

            if mate_i != mate_j and (mate_i ^ mate_j) != 3:
                j -= 1
                continue
            if x_i > x_j + cfg.max_dist_x:
                lb = j       # chain.hpp:318-322: advance lb, next j ends loop
                j -= 1
                continue
            x_d = x_i - x_j
            y_d = y_i - y_j
            l = (y_d - x_d) if y_d > x_d else (x_d - y_d)
            ilog_l = ilog2_32(l) if l > 0 else 0
            if ((mate_i == mate_j and (y_j >= y_i or y_d > cfg.max_dist_y))
                    or max(y_d, x_d) > cfg.G):
                j -= 1
                continue
            alpha = min(y_d, x_d, w_i)
            if mate_i != mate_j:
                if x_d == 0:
                    beta = 1
                else:
                    c_lin = int(l * .01 * avg_mem_length)
                    beta = c_lin if c_lin < ilog_l else ilog_l
            else:
                # chain.hpp:332: (ll)(.01*l*avg) + ilog_l >> 1 parses as
                # ((ll)(.01*l*avg) + ilog_l) >> 1
                beta = ((int(.01 * l * avg_mem_length) + ilog_l) >> 1
                        if l > 0 else 0)
            score = f[j] + (alpha - beta)
            if score > max_f:
                max_f = score
                max_j = j
                if n_pred > 0:
                    n_pred -= 1
            elif secondary and f_sec[j] + (alpha - beta) > max_sec_f:
                # secondary lane: predecessor must not reuse an occ
                # position on the current primary chain (chain.hpp:592-612)
                if max_j >= 0:
                    mem_j_pos = mems[mj].occs[oj]
                    tmp = max_j
                    uniq_chain = True
                    while tmp >= 0:
                        ti, to = anchors[tmp]
                        if mems[ti].occs[to] == mem_j_pos:
                            uniq_chain = False
                            break
                        tmp = p[tmp]
                    if uniq_chain:
                        max_sec_f = f_sec[j] + (alpha - beta)
                        max_sec_j = j
            elif t[j] == i:
                n_pred += 1
                if n_pred > cfg.max_pred:
                    break
            if p[j] > 0:
                t[p[j]] = i
            if secondary and p_sec[j] > 0:
                t_sec[p_sec[j]] = i
            j -= 1

        f[i] = max_f
        p[i] = max_j
        msc[i] = msc[max_j] if (max_j >= 0 and msc[max_j] > max_f) else max_f
        if secondary:
            f_sec[i] = max_sec_f
            p_sec[i] = max_sec_j
            msc_sec[i] = (msc_sec[max_sec_j]
                          if (max_sec_j >= 0
                              and msc_sec[max_sec_j] > max_sec_f)
                          else max_sec_f)
    return f, p, msc, f_sec, p_sec, msc_sec


def find_chains(mems, cfg: ChainParams = ChainParams()):
    """find_chains (chain.hpp:221-442). -> (anchors, chains): anchors
    sorted by reference end; chains sorted by score descending, each
    with anchors end-first."""
    anchors, tot_mem_length = _sorted_anchors(mems)
    if not anchors:
        return anchors, []
    avg = tot_mem_length / len(anchors)
    N = len(anchors)
    f, p, msc, _, _, _ = _chain_dp(mems, anchors, avg, cfg, False)

    t = [0] * N
    for i in range(N):
        if p[i] >= 0:
            t[p[i]] = 1
    chain_starts = _find_chain_starts(t, f, p, msc, N, cfg.min_chain_score)
    # std::sort greater<pair>: by (score, anchor index) both descending
    chain_starts.sort(key=lambda s: (-s[0], -s[1]))

    chains = []
    _backtrack(chain_starts, f, p, mems, anchors, N, cfg, chains)
    chains.sort(key=lambda c: -c.score)
    return anchors, chains


def find_chains_secondary(mems, cfg: ChainParams = ChainParams()):
    """find_chains_secondary (chain.hpp:442-727): dual-lane DP where
    the secondary lane's predecessors must avoid every occurrence
    position used by the current primary chain, yielding honest
    second-best chains; both lanes' chains are merged and sorted."""
    anchors, tot_mem_length = _sorted_anchors(mems)
    if not anchors:
        return anchors, []
    avg = tot_mem_length / len(anchors)
    N = len(anchors)
    f, p, msc, f_sec, p_sec, msc_sec = _chain_dp(
        mems, anchors, avg, cfg, True)

    t = [0] * N
    t_sec = [0] * N
    for i in range(N):
        if p[i] >= 0:
            t[p[i]] = 1
        if p_sec[i] >= 0:
            t_sec[p_sec[i]] = 1
    starts = _find_chain_starts(t, f, p, msc, N, cfg.min_chain_score)
    if not starts:   # chain.hpp:653: primary count gates the whole call
        return anchors, []
    starts_sec = _find_chain_starts(t_sec, f_sec, p_sec, msc_sec, N,
                                    cfg.min_chain_score)
    # chain.hpp:676-683: sorted by score only (ties unspecified there)
    starts.sort(key=lambda s: -s[0])
    starts_sec.sort(key=lambda s: -s[0])

    chains = []
    _backtrack(starts, f, p, mems, anchors, N, cfg, chains)
    _backtrack(starts_sec, f_sec, p_sec, mems, anchors, N, cfg, chains)
    chains.sort(key=lambda c: -c.score)
    return anchors, chains
