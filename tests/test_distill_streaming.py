"""Blocked/streaming distillation (counter_db.distill_kmers): parity with
the dense formulation and bounded peak memory at 10^6-k-mer scale, matching
the reference's chunk-parallel streaming (lib/KMerDB.ml:816-976)."""

import os
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_db(rng, nk, ns, n_classes):
    from kpop_tpu.core.counter_db import CounterDB

    counts = rng.integers(0, 50, size=(nk, ns)).astype(np.int32)
    db = CounterDB(
        row_names=["k%04d" % i for i in range(nk)],
        col_names=["S%d" % j for j in range(ns)],
        meta_names=["class"],
        meta=[["C%d" % (j % n_classes)] for j in range(ns)],
        counts=counts,
    )
    return db


def _dense_distill(db, classes_label):
    """The pre-streaming dense formulation, kept here as the golden
    reference: materializes the full [n_kmers, n_pairs] |diff| matrix."""
    from kpop_tpu.core.counter_db import upper_median

    n_classes, _, ind = db.indicator_vector(classes_label)
    n_samples = db.n_cols
    col_sums = db.counts.astype(np.float64).sum(axis=0)
    col_sums = np.where(col_sums == 0.0, 1.0, col_sums)
    x = db.counts.astype(np.float64) / col_sums[None, :]
    iu, ju = np.triu_indices(n_samples, k=1)
    diffs = np.abs(x[:, iu] - x[:, ju])
    ci, cj = ind[iu], ind[ju]
    a, b = np.minimum(ci, cj), np.maximum(ci, cj)
    pair_class = a * n_classes + b
    nk = db.n_rows

    def bucket_stats(sel):
        d = diffs[:, sel]
        n = d.shape[1]
        mean = d.mean(axis=1) if n else np.zeros(nk)
        var = d.var(axis=1, ddof=1) if n >= 2 else np.zeros(nk)
        with np.errstate(divide="ignore", invalid="ignore"):
            cov = np.where(mean > 0, np.sqrt(var) / mean, 0.0)
        return mean, var, cov

    out = {}
    for a_c in range(n_classes):
        sel = np.nonzero(pair_class == a_c * n_classes + a_c)[0]
        out[(a_c, a_c)] = (
            bucket_stats(sel) if sel.size else (np.zeros(nk),) * 3
        )
        for b_c in range(a_c + 1, n_classes):
            sel = np.nonzero(pair_class == a_c * n_classes + b_c)[0]
            out[(a_c, b_c)] = (
                bucket_stats(sel) if sel.size else (np.zeros(nk),) * 3
            )
    return out


def test_streaming_matches_dense_golden():
    """Multi-block streaming must reproduce the dense per-bucket stats and
    the full 18-row matrix bit-for-bit within float64 roundoff."""
    rng = np.random.default_rng(11)
    db = _make_db(rng, nk=137, ns=13, n_classes=4)  # odd sizes, odd blocks
    # tiny block budget => many blocks (rows_per_block floors at >= 1)
    got = db.distill_kmers("class", block_bytes=1)
    want = db.distill_kmers("class", block_bytes=1 << 30)  # single block
    np.testing.assert_allclose(got.data, want.data, rtol=1e-12, atol=1e-15)

    # cross-check the 18 rows against the dense formulation end to end
    dense = _dense_distill(db, "class")
    n_classes = 4
    on = [dense[(c, c)] for c in range(n_classes)]
    off = [
        dense[(a, b)]
        for a in range(n_classes)
        for b in range(a + 1, n_classes)
    ]
    from kpop_tpu.core.counter_db import upper_median

    avg_on = np.stack([m for m, _, _ in on], axis=1)
    assert np.allclose(got.data[0], avg_on.mean(axis=1), rtol=1e-12)
    assert np.allclose(
        got.data[3], upper_median(avg_on, axis=1), rtol=1e-12
    )
    avg_off = np.stack([m for m, _, _ in off], axis=1)
    assert np.allclose(got.data[1], avg_off.mean(axis=1), rtol=1e-12)
    var_off = np.stack([v for _, v, _ in off], axis=1)
    assert np.allclose(got.data[7], var_off.mean(axis=1), rtol=1e-12)
    cov_on = np.stack([cv for _, _, cv in on], axis=1)
    assert np.allclose(got.data[12], cov_on.mean(axis=1), rtol=1e-12)


def test_singleton_class_on_diagonal_empty():
    """A class with one sample has no on-diagonal pairs: its bucket must
    contribute zeros, not crash (missing-bucket path)."""
    rng = np.random.default_rng(13)
    from kpop_tpu.core.counter_db import CounterDB

    counts = rng.integers(0, 9, size=(20, 5)).astype(np.int32)
    db = CounterDB(
        row_names=["k%02d" % i for i in range(20)],
        col_names=["S%d" % j for j in range(5)],
        meta_names=["class"],
        meta=[["A"], ["A"], ["B"], ["B"], ["LONER"]],
        counts=counts,
    )
    m = db.distill_kmers("class", block_bytes=64)
    assert m.n_rows == 18 and np.isfinite(m.data).all()


def test_peak_memory_bounded_at_1m_kmers():
    """1.2M k-mers x 24 samples (276 pairs): the dense [nk, n_pairs] f64
    diff matrix alone would be ~2.7 GB (plus a full f64 table copy);
    streaming with a 128 MB block budget must stay under 1.6 GB peak RSS.
    Runs in a subprocess so ru_maxrss measures this workload only."""
    prog = textwrap.dedent("""
        import resource, sys
        import numpy as np
        sys.path.insert(0, %r)
        from kpop_tpu.core.counter_db import CounterDB
        rng = np.random.default_rng(0)
        nk, ns = 1_200_000, 24
        counts = rng.integers(0, 20, size=(nk, ns)).astype(np.int32)
        db = CounterDB(
            row_names=["k%%07d" %% i for i in range(nk)],
            col_names=["S%%d" %% j for j in range(ns)],
            meta_names=["class"],
            meta=[["C%%d" %% (j %% 4)] for j in range(ns)],
            counts=counts,
        )
        m = db.distill_kmers("class", block_bytes=128 << 20)
        assert m.data.shape == (18, nk)
        assert np.isfinite(m.data).all()
        peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print("PEAK_KB", peak_kb)
        assert peak_kb < 1.6 * 1024 * 1024, peak_kb
    """) % (REPO,)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PEAK_KB" in res.stdout
