"""Phase timers: the MTIME equivalent.

The reference wraps hot phases in compile-time MTIME stopwatch macros
merged across threads (include/common/common.hpp:468-525, phases named
at aligner_ksw2.hpp:53-65). Here: a contextmanager accumulating wall
time per named phase, enabled by MONITPU_PROFILE=1; report() prints the
same style of per-phase summary."""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict

ENABLED = os.environ.get("MONITPU_PROFILE", "0") not in ("", "0")

_acc = defaultdict(float)
_cnt = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name, sync=None):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    yield
    if sync is not None:
        # block_until_ready can return early under the axon TPU tunnel;
        # a host transfer of one element per leaf is a reliable fence
        import numpy as _np
        import jax
        for leaf in jax.tree.leaves(sync() if callable(sync) else sync):
            if hasattr(leaf, "shape"):
                _np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)
    dt = time.perf_counter() - t0
    _acc[name] += dt
    _cnt[name] += 1
    print(f"[mtime] {name}: {dt:.3f}s (total {_acc[name]:.2f}s "
          f"x{_cnt[name]})", file=sys.stderr, flush=True)


def report():
    if not _acc:
        return
    print("[mtime] ---- phase totals ----", file=sys.stderr)
    for k, v in sorted(_acc.items(), key=lambda kv: -kv[1]):
        print(f"[mtime] {k}: {v:.2f}s x{_cnt[k]}", file=sys.stderr)
