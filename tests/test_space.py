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


def test_summarize_rowwise_blocked_parity_and_memory():
    """Blocked streaming (lib/Matrix.ml:691-766 never materializes the full
    matrix): tiny blocks must give identical lines, and peak allocation must
    stay far below the full [n_queries, n_targets] matrix."""
    import tracemalloc

    rng = np.random.default_rng(7)
    dist = Distance.of_string("euclidean")
    d = 6
    metric = np.abs(rng.standard_normal(d))
    metric /= metric.sum()
    targets = NamedMatrix(
        [f"t{i}" for i in range(37)], [f"d{j}" for j in range(d)],
        rng.standard_normal((37, d)),
    )
    queries = NamedMatrix(
        [f"q{i}" for i in range(53)], [f"d{j}" for j in range(d)],
        rng.standard_normal((53, d)),
    )
    one_shot = summarize_rowwise(
        dist, metric, targets, queries, keep_at_most=3,
        block_elements=10**9,
    )
    blocked = summarize_rowwise(
        dist, metric, targets, queries, keep_at_most=3, block_elements=64
    )
    # blocked matmuls may differ in the last ulp (BLAS summation order);
    # names must match exactly, floats to 1e-12 relative
    assert len(blocked) == len(one_shot)
    for lb, lo in zip(blocked, one_shot):
        pb, po = lb.split("\t"), lo.split("\t")
        assert len(pb) == len(po)
        for fb, fo in zip(pb, po):
            try:
                vb, vo = float(fb), float(fo)
            except ValueError:
                assert fb == fo
            else:
                assert vb == pytest.approx(vo, rel=1e-12, abs=1e-12)

    # memory bound: 5000 queries x 400 targets = 16 MB if materialized;
    # blocked at 10000 elements the peak must stay well under that.
    big_t = NamedMatrix(
        [f"t{i}" for i in range(400)], [f"d{j}" for j in range(d)],
        rng.standard_normal((400, d)),
    )
    big_q = NamedMatrix(
        [f"q{i}" for i in range(5000)], [f"d{j}" for j in range(d)],
        rng.standard_normal((5000, d)),
    )
    tracemalloc.start()
    summarize_rowwise(
        dist, metric, big_t, big_q, keep_at_most=1, block_elements=10000
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 2**20, peak


def test_distance_mode_infinity():
    """lib/Space.ml:46-51,144-149: geometry mismatch raises in 'fail' mode
    (default) and yields +infinity distances in 'infinity' mode."""
    from kpop_tpu.core.matrix import IncompatibleGeometries
    from kpop_tpu.core.space import get_mode, set_mode

    rng = np.random.default_rng(11)
    dist = Distance.of_string("euclidean")
    metric = np.ones(3) / 3
    m1 = NamedMatrix(["a", "b"], ["d0", "d1", "d2"], rng.standard_normal((2, 3)))
    m2 = NamedMatrix(["q"], ["d0", "d1"], rng.standard_normal((1, 2)))
    assert get_mode() == "fail"
    with pytest.raises(IncompatibleGeometries):
        distance_rowwise(dist, metric, m1, m2)
    with pytest.raises(IncompatibleGeometries):
        summarize_rowwise(dist, metric, m1, m2)
    set_mode("infinity")
    try:
        dm = distance_rowwise(dist, metric, m1, m2)
        assert dm.row_names == ["q"] and dm.col_names == ["a", "b"]
        assert np.all(np.isinf(np.asarray(dm.data)))
        lines = summarize_rowwise(dist, metric, m1, m2, keep_at_most=1)
        assert len(lines) == 1
        parts = lines[0].split("\t")
        assert parts[0] == "q"
        assert float(parts[1]) == np.inf  # mean
        assert float(parts[3]) == np.inf  # median
        # infinite distances still rank (stably, by index)
        assert parts[5] == "a" and float(parts[6]) == np.inf
        with pytest.raises(ValueError):
            set_mode("bogus")
    finally:
        set_mode("fail")


def test_distance_mode_cli_flag(tmp_path):
    """kpop-twistdb --distance-mode infinity lets -s run across registers of
    mismatched dimensionality, producing all-inf summary rows."""
    from kpop_tpu.cli import twistdb as twistdb_cli
    from kpop_tpu.core.matrix import KPopMatrix, MatrixType
    from kpop_tpu.core.twister import Twister

    rng = np.random.default_rng(5)
    dims3 = ["Dim1", "Dim2", "Dim3"]
    kmers = ["AA", "AC", "AG", "AT"]
    tw = Twister(
        KPopMatrix(
            MatrixType.TWISTER,
            NamedMatrix(dims3, kmers, rng.standard_normal((3, 4))),
        ),
        KPopMatrix(
            MatrixType.INERTIA,
            NamedMatrix(["inertia"], dims3, np.array([[0.6, 0.3, 0.1]])),
        ),
    )
    tw.to_binary(str(tmp_path / "T"))
    KPopMatrix(
        MatrixType.TWISTED,
        NamedMatrix(["s1", "s2"], dims3, rng.standard_normal((2, 3))),
    ).to_binary(str(tmp_path / "train"))
    # queries twisted with a DIFFERENT dimensionality
    KPopMatrix(
        MatrixType.TWISTED,
        NamedMatrix(["q1"], ["Dim1", "Dim2"], rng.standard_normal((1, 2))),
    ).to_binary(str(tmp_path / "queries"))
    args = [
        "-i", "T", str(tmp_path / "T"),
        "-i", "t", str(tmp_path / "train"),
        "--distance-mode", "infinity",
        "-s", str(tmp_path / "queries"), str(tmp_path / "out"),
    ]
    try:
        assert twistdb_cli.main(args) == 0
    finally:
        from kpop_tpu.core.space import set_mode

        set_mode("fail")
    lines = (tmp_path / "out.KPopSummary.txt").read_text().splitlines()
    assert len(lines) == 1
    parts = lines[0].split("\t")
    assert parts[0] == "q1" and float(parts[1]) == np.inf
