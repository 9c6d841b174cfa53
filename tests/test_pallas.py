"""Pallas kernels (interpret mode on CPU) vs host float64 golden paths."""

import numpy as np
import pytest

from kpop_tpu.core.matrix import NamedMatrix
from kpop_tpu.core.space import Distance, distance_rowwise


def test_pallas_pairwise_matches_host():
    from kpop_tpu.ops.pallas_pairwise import pairwise_distances_pallas

    rng = np.random.default_rng(0)
    Q, T, D = 70, 33, 19  # deliberately non-aligned shapes
    queries = rng.standard_normal((Q, D))
    targets = rng.standard_normal((T, D))
    metric = rng.random(D)
    metric /= metric.sum()
    got = np.asarray(
        pairwise_distances_pallas(
            queries.astype(np.float32),
            targets.astype(np.float32),
            metric.astype(np.float32),
            interpret=True,
        )
    )
    m1 = NamedMatrix([f"t{i}" for i in range(T)], [f"d{j}" for j in range(D)], targets)
    m2 = NamedMatrix([f"q{i}" for i in range(Q)], [f"d{j}" for j in range(D)], queries)
    want = distance_rowwise(
        Distance.of_string("euclidean"), metric, m1, m2
    ).data  # [Q, T] rows = m2
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_pallas_pairwise_unnormalized():
    from kpop_tpu.ops.pallas_pairwise import pairwise_distances_pallas

    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 4)).astype(np.float32)
    b = rng.standard_normal((5, 4)).astype(np.float32)
    m = np.ones(4, dtype=np.float32)
    got = np.asarray(
        pairwise_distances_pallas(a, b, m, normalize=False, interpret=True)
    )
    want = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
