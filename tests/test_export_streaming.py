"""Streaming transform/export (counter_db.to_table / to_spectra /
transformed): blocked output must be byte-identical to single-block output
across all transforms, and peak memory must stay bounded at multi-million-row
scale, matching the reference's chunk-parallel writer (lib/KMerDB.ml:1004-1171)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_db(rng, nk=233, ns=7):
    from kpop_tpu.core.counter_db import CounterDB

    counts = rng.integers(0, 40, size=(nk, ns)).astype(np.int32)
    counts[rng.random(size=counts.shape) < 0.3] = 0
    counts[5] = 0  # a zero row (dropped unless print_zero_rows)
    db = CounterDB(
        row_names=["%03x" % i for i in range(nk)],
        col_names=["S%d" % j for j in range(ns)],
        meta_names=["class"],
        meta=[["C%d" % (j % 3)] for j in range(ns)],
        counts=counts,
    )
    return db


TRANSFORMS = [
    ("power", 1.0, 1.0),
    ("power", 2.0, 0.5),
    ("power", 0.02, 1.0),  # fractional threshold (column-sum relative)
    ("binary", 1.0, 1.0),
    ("clr", 1.0, 1.0),
    ("pseudocounts", 2.0, 1.0),
]


@pytest.mark.parametrize("which,thr,pw", TRANSFORMS)
@pytest.mark.parametrize("transpose", [False, True])
def test_to_table_blocked_bytes_identical(tmp_path, which, thr, pw, transpose):
    from kpop_tpu.core.counter_db import TableFilter
    from kpop_tpu.core.transforms import Transformation

    rng = np.random.default_rng(5)
    db = _make_db(rng)
    filt = TableFilter(
        transform=Transformation(which, thr, pw),
        transpose=transpose,
        print_metadata=True,
    )
    db.to_table(str(tmp_path / "one"), filt, block_bytes=1 << 30)
    db.to_table(str(tmp_path / "many"), filt, block_bytes=1)
    one = (tmp_path / "one.KPopCounter.txt").read_bytes()
    many = (tmp_path / "many.KPopCounter.txt").read_bytes()
    assert one == many and len(one) > 100


def test_to_spectra_blocked_bytes_identical(tmp_path):
    from kpop_tpu.core.counter_db import TableFilter
    from kpop_tpu.core.transforms import Transformation

    rng = np.random.default_rng(6)
    db = _make_db(rng)
    filt = TableFilter(transform=Transformation("power", 2.0, 1.0))
    db.to_spectra(str(tmp_path / "one"), filt, block_bytes=1 << 30)
    db.to_spectra(str(tmp_path / "many"), filt, block_bytes=1)
    assert (tmp_path / "one.KPopSpectra.txt").read_bytes() == (
        tmp_path / "many.KPopSpectra.txt"
    ).read_bytes()


def test_transformed_blocked_parity():
    from kpop_tpu.core.counter_db import TableFilter
    from kpop_tpu.core.transforms import Transformation, stats_table

    rng = np.random.default_rng(7)
    db = _make_db(rng)
    for which, thr, pw in TRANSFORMS:
        filt = TableFilter(transform=Transformation(which, thr, pw))
        r1, c1, s1 = db.transformed(filt, block_bytes=1 << 30)
        r2, c2, s2 = db.transformed(filt, block_bytes=1)
        assert r1 == r2 and c1 == c2
        np.testing.assert_array_equal(s1, s2)
    # blocked stats accumulation == single-block stats
    tr = Transformation("power", 0.02, 1.0)
    a = stats_table(db.counts, tr, block_bytes=1 << 30)
    b = stats_table(db.counts, tr, block_bytes=1)
    for f in (
        "col_non_zero", "col_min", "col_max", "col_sum", "col_sum_log",
        "row_non_zero", "row_min", "row_max", "row_sum", "row_sum_log",
    ):
        np.testing.assert_allclose(
            getattr(a, f), getattr(b, f), rtol=1e-13, atol=0
        )


def test_transformed_counts_identity_is_int32():
    """The twist driver's default transform (power/1/1) must skip the
    float64 materialization entirely and agree with transformed()."""
    from kpop_tpu.core.counter_db import TableFilter

    rng = np.random.default_rng(8)
    db = _make_db(rng)
    filt = TableFilter()
    rows, cols, sub = db.transformed_counts(filt)
    assert sub.dtype == np.int32
    r2, c2, s2 = db.transformed(filt)
    assert rows == r2 and cols == c2
    np.testing.assert_array_equal(sub.astype(np.float64), s2)


def test_export_peak_memory_bounded_at_5m_rows():
    """5M k-mers x 48 samples (a ~1 GB int32 DB, the reference's 2 GB
    counter ballpark, README.md:1029): the old path materialized the full
    float64 transformed matrix (1.9 GB) plus a fancy-indexed copy and
    full-matrix float64 stats temporaries (~6 GB extra); the streaming
    export must add < 600 MB over the built-DB baseline (per-row stats
    arrays + one 32 MB block + text buffers)."""
    prog = textwrap.dedent("""
        import resource, sys
        import numpy as np
        sys.path.insert(0, %r)
        from kpop_tpu.core.counter_db import CounterDB, TableFilter
        from kpop_tpu.core.transforms import Transformation
        from kpop_tpu.utils.progress import set_verbose

        set_verbose(True)  # the -v live progress must ride along for free

        def rss_kb():
            return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

        rng = np.random.default_rng(0)
        nk, ns = 5_000_000, 48
        counts = rng.integers(0, 30, size=(nk, ns)).astype(np.int32)
        db = CounterDB(
            row_names=["%%06x" %% i for i in range(nk)],
            col_names=["S%%d" %% j for j in range(ns)],
            counts=counts,
        )
        base = rss_kb()
        filt = TableFilter(transform=Transformation("clr", 1.0, 1.0))
        db.to_table("/dev/null", filt, block_bytes=32 << 20)
        delta_kb = rss_kb() - base
        print("BASE_KB", base, "EXPORT_DELTA_KB", delta_kb)
        assert delta_kb < 600 * 1024, delta_kb
    """) % (REPO,)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "EXPORT_DELTA_KB" in res.stdout
    # live carriage-return progress through the streamed passes
    # (reference -v UX, lib/KMerDB.ml:226-229); \r itself is
    # newline-translated by text=True, so assert on the clear escape
    assert "\x1b[K" in res.stderr
    assert "(KMerDB.stats): Computing col/row statistics" in res.stderr
    assert "(KMerDB.to_table): Writing table [5000000/5000000] lines." \
        in res.stderr


def test_twist_table_peak_memory_identity_int32():
    """The twist-training table build (transformed_counts, identity
    transform) at 5M x 48 must stay int32 end to end: the delta over the
    built DB is the int32 subset copy (~0.9 GB) + stats + name tuples —
    NOT the old 2x full-float64 (3.8+ GB)."""
    prog = textwrap.dedent("""
        import resource, sys
        import numpy as np
        sys.path.insert(0, %r)
        from kpop_tpu.core.counter_db import CounterDB, TableFilter
        rng = np.random.default_rng(0)
        nk, ns = 5_000_000, 48
        counts = rng.integers(0, 30, size=(nk, ns)).astype(np.int32)
        db = CounterDB(
            row_names=["%%06x" %% i for i in range(nk)],
            col_names=["S%%d" %% j for j in range(ns)],
            counts=counts,
        )
        base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        rows, cols, sub = db.transformed_counts(TableFilter())
        assert sub.dtype == np.int32 and sub.shape[1] == ns
        delta_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss - base
        print("TWIST_DELTA_KB", delta_kb)
        assert delta_kb < 1.8 * 1024 * 1024, delta_kb
    """) % (REPO,)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "TWIST_DELTA_KB" in res.stdout
