"""Edge cases and failure-mode contracts."""

import io

import numpy as np
import pytest

from kpop_tpu.core.counter_db import (
    ClassesLabelNotFound,
    ClassLabelIsAlsoSpectrumName,
    CounterDB,
    InvalidNumberOfClasses,
    TableFilter,
)
from kpop_tpu.core.matrix import (
    DuplicateRowName,
    IncompatibleGeometries,
    KPopMatrix,
    MatrixType,
    NamedMatrix,
)
from kpop_tpu.core.space import Metric
from kpop_tpu.core.transforms import Transformation, UnknownTransformation
from kpop_tpu.core.twister import TwistParameters, twist_counter_db
from kpop_tpu.io.spectra import SpectraFormatError, iter_spectra


def test_empty_db_operations():
    db = CounterDB()
    assert db.selected_from_regexps([("", ".")]) == set()
    assert db.selected_negate(set()) == set()
    db2 = db.remove_selected(set())
    assert db2.n_cols == 0
    assert db.summary_lines()[0].startswith("[Spectrum labels (0)]")


def test_combine_empty_selection():
    db = CounterDB()
    db.add_spectra_stream(io.StringIO("\tA\n00\t5\n"))
    db.add_combined_selected("COMB", set(), "mean")
    assert "COMB" in db.col_names
    assert db.counts[:, db.col_names.index("COMB")].sum() == 0


def test_split_spectra_name_clash():
    db = CounterDB()
    db.add_spectra_stream(io.StringIO("\tC1\n00\t5\n\tB\n01\t2\n"))
    import os
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("label\tclass\nC1\tC1\nB\tC1\n")
        path = f.name
    try:
        with pytest.raises(ClassLabelIsAlsoSpectrumName):
            db.add_meta(path)
            db.split_spectra("class")
    finally:
        os.unlink(path)


def test_distill_invalid_class_counts():
    db = CounterDB()
    db.add_spectra_stream(io.StringIO("\tA\n00\t5\n\tB\n00\t3\n"))
    import os
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("label\tclass\nA\tX\nB\tX\n")
        path = f.name
    try:
        db.add_meta(path)
    finally:
        os.unlink(path)
    with pytest.raises(InvalidNumberOfClasses):
        db.distill_kmers("class")  # one class
    with pytest.raises(ClassesLabelNotFound):
        db.indicator_vector("nope")


def test_single_sample_twist_degenerates():
    db = CounterDB()
    db.add_spectra_stream(io.StringIO("\tA\n00\t5\n01\t2\n"))
    tw, twisted, _ = twist_counter_db(db, TwistParameters())
    # min(n_kmers, n_samples) - 1 = 0 dims -> clamped to 1 trivial dim
    assert twisted.matrix.data.shape[0] == 1


def test_unknown_transformation_rejected():
    with pytest.raises(UnknownTransformation):
        Transformation("bogus", 1.0, 1.0)


def test_metric_validation():
    with pytest.raises(Exception):
        Metric.of_string("powers(-1,1,2)")
    with pytest.raises(Exception):
        Metric.of_string("powers(1,2,2)")  # threshold > 1
    with pytest.raises(Exception):
        Metric.of_string("gibberish")


def test_spectra_format_errors():
    with pytest.raises(SpectraFormatError):
        list(iter_spectra(io.StringIO("00\t1\n")))  # entry before header
    with pytest.raises(SpectraFormatError):
        list(iter_spectra(io.StringIO("\tA\n00\t1\t2\n")))  # 3 fields


def test_merge_duplicate_and_geometry_errors():
    a = KPopMatrix(MatrixType.TWISTED, NamedMatrix(["x"], ["Dim1"], [[1.0]]))
    b = KPopMatrix(MatrixType.TWISTED, NamedMatrix(["x"], ["Dim1"], [[2.0]]))
    with pytest.raises(DuplicateRowName):
        a.merge_rowwise(b)
    c = KPopMatrix(MatrixType.TWISTED, NamedMatrix(["y"], ["DimZ"], [[2.0]]))
    with pytest.raises(IncompatibleGeometries):
        a.merge_rowwise(c)


def test_table_filter_columns_and_precision(tmp_path):
    db = CounterDB()
    db.add_spectra_stream(io.StringIO("\tA\n00\t5\n\tB\n00\t7\n"))
    filt = TableFilter(filter_columns=frozenset({"B"}), precision=3)
    db.to_table(str(tmp_path / "T"), filt)
    text = (tmp_path / "T.KPopCounter.txt").read_text()
    assert "B" not in text.splitlines()[0]
    assert text.splitlines()[1] == "00\t5"


def test_row_growth_keeps_views_consistent():
    """Capacity-based growth must never lose or corrupt counts."""
    rng = np.random.default_rng(0)
    db = CounterDB()
    shadow = {}
    for s in range(8):
        entries = []
        for _ in range(50):
            code = "%03x" % rng.integers(0, 200)
            v = int(rng.integers(1, 9))
            entries.append((code, v))
            shadow[(code, s)] = shadow.get((code, s), 0) + v
        text = "\tS%d\n" % s + "".join("%s\t%d\n" % e for e in entries)
        db.add_spectra_stream(io.StringIO(text))
    for (code, s), v in shadow.items():
        assert db.counts[db.row_names.index(code), s] == v
    assert db.counts.shape == (db.n_rows, db.n_cols)
