"""Native SA-IS / Kasai vs NumPy doubling and brute force."""

import numpy as np
import pytest

from monitpu.index.build import _suffix_array_doubling

native = pytest.importorskip("monitpu.native.sais")


@pytest.mark.parametrize("n,sigma", [(1, 1), (2, 1), (100, 2), (1000, 4),
                                     (5000, 6), (20000, 4)])
def test_sais_matches_doubling(rng, n, sigma):
    t = rng.integers(0, sigma, size=n, dtype=np.int8)
    t[-1] = 0
    sa = native.suffix_array(t)
    np.testing.assert_array_equal(sa, _suffix_array_doubling(t))


def test_sais_repetitive(rng):
    unit = rng.integers(1, 5, size=97, dtype=np.int8)
    t = np.tile(unit, 200)
    t = np.concatenate([t, np.array([0], dtype=np.int8)])
    sa = native.suffix_array(t)
    np.testing.assert_array_equal(sa, _suffix_array_doubling(t))


def test_kasai(rng):
    t = rng.integers(1, 5, size=3000, dtype=np.int8)
    t[-1] = 0
    sa = native.suffix_array(t)
    lcp = native.lcp_array(t, sa)
    # spot check random rows
    for i in rng.integers(1, 3000, size=50):
        a, b = t[sa[i - 1]:], t[sa[i]:]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        assert lcp[i] == l
    assert lcp[0] == 0


def test_sais_all_equal():
    t = np.zeros(64, dtype=np.int8)
    sa = native.suffix_array(t)
    np.testing.assert_array_equal(sa, np.arange(63, -1, -1, dtype=np.int32))
