import math

import numpy as np
import pytest

from kpop_tpu.core.matrix import NamedMatrix
from kpop_tpu.core.space import (
    Distance,
    Metric,
    distance_matrix,
    distance_rowwise,
    embeddings,
    normalizations,
    summarize_distance_row,
    summarize_rowwise,
)


def scalar_distance(dist, metric, a, b, na=1.0, nb=1.0):
    """Scalar transcription of lib/Space.ml:182-205."""
    acc = 0.0
    for i in range(len(a)):
        diff = a[i] / na - b[i] / nb
        if dist.kind in ("euclidean", "cosine"):
            acc += diff * diff * metric[i]
        else:
            acc += abs(diff) ** dist.power * metric[i]
    if dist.kind == "euclidean":
        return math.sqrt(acc)
    if dist.kind == "cosine":
        return acc / 2.0
    return acc ** (1.0 / dist.power)


@pytest.mark.parametrize(
    "spec", ["euclidean", "cosine", "minkowski(3)", "minkowski(1)"]
)
def test_rowwise_matches_scalar(spec):
    rng = np.random.default_rng(0)
    dist = Distance.of_string(spec)
    d = 7
    metric = rng.random(d)
    m1 = NamedMatrix([f"a{i}" for i in range(4)], [f"d{j}" for j in range(d)], rng.standard_normal((4, d)))
    m2 = NamedMatrix([f"b{i}" for i in range(3)], [f"d{j}" for j in range(d)], rng.standard_normal((3, d)))
    res = distance_rowwise(dist, metric, m1, m2, normalize=True)
    n1 = normalizations(dist, metric, m1.data)
    n2 = normalizations(dist, metric, m2.data)
    assert res.row_names == m2.row_names and res.col_names == m1.row_names
    for j in range(3):
        for i in range(4):
            want = scalar_distance(dist, metric, m1.data[i], m2.data[j], n1[i], n2[j])
            assert res.data[j, i] == pytest.approx(want, rel=1e-10, abs=1e-12)


def test_distance_strings_roundtrip():
    for s in ["euclidean", "cosine", "minkowski(3)"]:
        assert Distance.of_string(s).to_string() == s
    assert Metric.of_string("flat").to_string() == "flat"
    assert Metric.of_string("powers(1,1,2)").to_string() == "powers(1,1,2)"


def test_metric_powers_default():
    # default powers(1,1,2): weights = inertia^2 / sum(inertia^2)
    inertia = np.array([0.5, 0.3, 0.2])
    m = Metric.of_string("powers(1,1,2)").compute(inertia)
    want = inertia**2 / (inertia**2).sum()
    np.testing.assert_allclose(m, want)


def test_metric_powers_threshold():
    # threshold 0.7: keep elements while cumulative mass before them < 0.7
    inertia = np.array([0.5, 0.3, 0.15, 0.05])
    m = Metric.of_string("powers(1,0.7,1)").compute(inertia)
    # cum_before = [0, .5, .8, .95]; kept: idx0 (0<.7), idx1 (.5<.7); rest 0
    want = np.array([0.5, 0.3, 0.0, 0.0])
    want = want / want.sum()
    np.testing.assert_allclose(m, want)


def test_metric_flat():
    np.testing.assert_allclose(
        Metric.of_string("flat").compute(np.ones(4)), np.full(4, 0.25)
    )


def test_embeddings_normalized_rows_have_unit_norm():
    rng = np.random.default_rng(1)
    dist = Distance.of_string("euclidean")
    metric = rng.random(5)
    metric /= metric.sum()
    m = NamedMatrix(["a", "b"], [f"d{j}" for j in range(5)], rng.standard_normal((2, 5)))
    e = embeddings(dist, metric, m, normalize=True)
    norms = dist.compute_norm(metric, e.data)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-12)


def test_summary_line_semantics():
    row = np.array([3.0, 1.0, 2.0, 1.0, 5.0])
    cols = ["c0", "c1", "c2", "c3", "c4"]
    line = summarize_distance_row(2, "q", row, cols)
    parts = line.split("\t")
    assert parts[0] == "q"
    mean = row.mean()
    std = math.sqrt(((row - mean) ** 2).sum() / 4)
    med = np.sort(row)[2]  # upper median of 5 elements = idx 2
    mad = np.sort(np.abs(row - med))[2]
    assert float(parts[1]) == pytest.approx(mean)
    assert float(parts[2]) == pytest.approx(std)
    assert float(parts[3]) == pytest.approx(med)
    assert float(parts[4]) == pytest.approx(mad)
    # req_len=2 but the 2nd-smallest value (1.0) is tied -> both kept: c1, c3
    assert parts[5] == "c1" and parts[8] == "c3"
    assert len(parts) == 5 + 2 * 3
    assert float(parts[6]) == 1.0
    z = (1.0 - mean) / std
    assert float(parts[7]) == pytest.approx(z)


def test_summary_ties_extend_group():
    row = np.array([1.0, 1.0, 1.0, 2.0])
    line = summarize_distance_row(2, "q", row, ["a", "b", "c", "d"])
    parts = line.split("\t")
    # the tie group at distance 1.0 has 3 members >= req_len 2 -> all 3 kept
    assert len(parts) == 5 + 3 * 3
    assert [parts[5], parts[8], parts[11]] == ["a", "b", "c"]


def test_distance_matrix_symmetric():
    rng = np.random.default_rng(2)
    dist = Distance.of_string("euclidean")
    metric = np.ones(4) / 4
    m = NamedMatrix([f"r{i}" for i in range(5)], [f"d{j}" for j in range(4)], rng.standard_normal((5, 4)))
    dm = distance_matrix(dist, metric, m)
    np.testing.assert_allclose(dm.data, dm.data.T)
    assert np.all(np.diag(dm.data) == 0.0)
