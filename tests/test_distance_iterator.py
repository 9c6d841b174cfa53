"""Parity test for the 1-D nearest-pair iterator.

The fixture ``data/distance_iterator_golden.txt`` is the pair sequence from
the reference's only golden unit test (reference test/DistanceIterator.ml
driving ``Space.Distance.Iterator`` over a fixed 12-point vector with
max_distance_component=0.3; expected output test/DistanceIterator.txt).
Our iterator must reproduce it bit-for-bit — including IEEE-float tie
behaviour (e.g. 0.5-0.4 < 0.2-0.1 makes (6,10) precede (0,2))."""

import itertools
import os

import numpy as np
import pytest

from kpop_tpu.core.distance_iterator import DistanceIterator, iterate_pairs
from kpop_tpu.core.space import Distance

GOLDEN = os.path.join(
    os.path.dirname(__file__), "data", "distance_iterator_golden.txt"
)

INIT = [0.1, 0.1, 0.2, 0.2, 0.2, 0.7, 0.5, 0.99, 0.999, 0.05, 0.4, 0.05]


def test_matches_reference_golden_output():
    got = [
        "(%d, %d): %.15g" % (i, j, c)
        for i, j, c in iterate_pairs(
            Distance.of_string("minkowski(1)"), 1.0, INIT,
            max_distance_component=0.3,
        )
    ]
    want = [ln.strip() for ln in open(GOLDEN)]
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_enumerates_all_pairs_in_order(seed):
    rng = np.random.default_rng(seed)
    coords = rng.integers(0, 50, size=20).astype(float) / 10.0
    dist = Distance.of_string("euclidean")
    pairs = list(iterate_pairs(dist, 0.5, coords.tolist()))
    # every pair exactly once
    assert len(pairs) == 20 * 19 // 2
    seen = {(i, j) for i, j, _ in pairs}
    assert seen == set(itertools.combinations(range(20), 2))
    # non-decreasing component distances
    comps = [c for _, _, c in pairs]
    assert all(a <= b + 1e-15 for a, b in zip(comps, comps[1:]))
    # components are correct
    for i, j, c in pairs[:50]:
        want = (coords[i] - coords[j]) ** 2 * 0.5
        assert c == pytest.approx(want, abs=1e-15)


def test_max_distance_component_prunes():
    coords = [0.0, 0.1, 0.5, 1.0]
    dist = Distance.of_string("minkowski(1)")
    pairs = list(iterate_pairs(dist, 1.0, coords, max_distance_component=0.45))
    got = {(i, j) for i, j, _ in pairs}
    assert got == {(0, 1), (1, 2)}  # 0.1 and 0.4; 0.5+ pruned


def test_empty_and_single():
    dist = Distance.of_string("euclidean")
    assert list(iterate_pairs(dist, 1.0, [])) == []
    assert list(iterate_pairs(dist, 1.0, [1.0])) == []
    it = DistanceIterator(dist, 1.0, lambda i: [1.0][i], 1)
    assert it.get_opt() is None
    assert it.range() == (1.0, 1.0)
