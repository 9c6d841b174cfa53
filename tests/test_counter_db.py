import io

import numpy as np
import pytest

from kpop_tpu.core.counter_db import CounterDB, TableFilter
from kpop_tpu.core.transforms import Transformation

SPECTRA = """\tS1
00a\t3
00b\t5
\tS2
00a\t1
00c\t7
00a\t2
\tS3
00b\t4
"""


def make_db():
    db = CounterDB()
    db.add_spectra_stream(io.StringIO(SPECTRA))
    return db


def test_ingest_accumulates_duplicates():
    db = make_db()
    assert db.col_names == ["S1", "S2", "S3"]
    assert db.row_names == ["00a", "00b", "00c"]
    # duplicate 00a in S2 accumulates: 1 + 2 = 3
    assert db.counts[db.row_names.index("00a"), 1] == 3
    assert db.counts[db.row_names.index("00c"), 1] == 7


def test_meta_and_selection():
    db = make_db()
    meta = "label\tclass\nS1\tC1\nS2\tC2\nS3\tC1\n"
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(meta)
        path = f.name
    try:
        db.add_meta(path)
    finally:
        os.unlink(path)
    assert db.meta_names == ["class"]
    sel = db.selected_from_regexps([("class", "C1")])
    assert sel == {"S1", "S3"}
    sel2 = db.selected_from_regexps([("", "S")])
    assert sel2 == {"S1", "S2", "S3"}
    sel3 = db.selected_from_regexps([("", "S"), ("class", "C2")])
    assert sel3 == {"S2"}
    assert db.selected_negate(sel3) == {"S1", "S3"}


def test_combine_mean():
    db = make_db()
    # S1 sums to 8, S2 sums to 10, S3 sums to 4 -> max_norm 10
    db.add_combined_selected("COMB", {"S1", "S3"}, "mean")
    # norms: S1=8, S3=4 ; max_norm = 8
    # row 00a: S1=3*8/8=3, S3=0 -> 3 ; row 00b: 5 + 4*8/4=8 -> 13
    col = db.counts[:, db.col_names.index("COMB")]
    assert col[db.row_names.index("00a")] == 3
    assert col[db.row_names.index("00b")] == 13
    assert col[db.row_names.index("00c")] == 0


def test_combine_median():
    db = make_db()
    db.add_combined_selected("M", {"S1", "S2", "S3"}, "median")
    # norms 8,10,4, max 10. row 00b values: S1 5*10/8=6.25, S2 0, S3 4*10/4=10
    # sorted [0, 6.25, 10] -> upper median idx 1 = 6.25; *3 = 18.75 -> int 18
    col = db.counts[:, db.col_names.index("M")]
    assert col[db.row_names.index("00b")] == 18


def test_split_spectra_and_remove():
    db = make_db()
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("label\tclass\nS1\tC1\nS2\tC2\nS3\tC1\n")
        path = f.name
    try:
        db.add_meta(path)
    finally:
        os.unlink(path)
    db2 = db.split_spectra("class", "mean")
    assert db2.col_names == ["C1", "C2"]
    assert db2.n_rows == 3
    # combined metadata: class field shared -> kept
    assert db2.meta[0][0] == "C1"


def test_table_roundtrip_quickstart_trick():
    """Exporting a single-column table with row names produces a stream
    that parses as spectra — the quick-start relies on this (README.md:91)."""
    db = make_db()
    db2 = db.remove_selected({"S2", "S3"})
    out = io.StringIO()
    # to_table writes to a file; emulate via /dev/stdout-like path
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        db2.to_table(os.path.join(td, "T"))
        text = open(os.path.join(td, "T.KPopCounter.txt")).read()
    db3 = CounterDB()
    db3.add_spectra_stream(io.StringIO(text))
    assert db3.col_names == ["S1"]
    assert db3.counts[db3.row_names.index("00a"), 0] == 3


def test_binary_roundtrip(tmp_path):
    db = make_db()
    prefix = str(tmp_path / "db")
    db.to_binary(prefix)
    db2 = CounterDB.of_binary(prefix)
    assert db2.col_names == db.col_names
    assert db2.row_names == db.row_names
    np.testing.assert_array_equal(db2.counts, db.counts)


def test_to_spectra_drops_zeros(tmp_path):
    db = make_db()
    prefix = str(tmp_path / "sp")
    db.to_spectra(prefix)
    text = open(str(tmp_path / "sp.KPopSpectra.txt")).read()
    db2 = CounterDB()
    db2.add_spectra_stream(io.StringIO(text))
    np.testing.assert_array_equal(db2.counts, db.counts)


def test_transposed_table(tmp_path):
    db = make_db()
    filt = TableFilter(transpose=True, print_metadata=False)
    db.to_table(str(tmp_path / "T"), filt)
    lines = open(str(tmp_path / "T.KPopCounter.txt")).read().splitlines()
    assert lines[0] == "\t00a\t00b\t00c"
    assert lines[1].split("\t")[0] == "S1"


def test_distill_shapes():
    db = make_db()
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("label\tclass\nS1\tC1\nS2\tC2\nS3\tC1\n")
        path = f.name
    try:
        db.add_meta(path)
    finally:
        os.unlink(path)
    m = db.distill_kmers("class")
    assert m.n_rows == 18
    assert m.n_cols == 3
    assert m.row_names[0] == "InnerAvgMean"


def test_table_with_metadata_rows(tmp_path):
    db = make_db()
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("label\tclass\torigin\nS1\tC1\tuk\nS2\tC2\tfr\nS3\tC1\tuk\n")
        path = f.name
    try:
        db.add_meta(path)
    finally:
        os.unlink(path)
    filt = TableFilter(print_metadata=True)
    db.to_table(str(tmp_path / "T"), filt)
    lines = open(str(tmp_path / "T.KPopCounter.txt")).read().splitlines()
    # metadata rows come before k-mer rows (lib/KMerDB.ml:1110-1121)
    assert lines[0] == "\tS1\tS2\tS3"
    assert lines[1] == "class\tC1\tC2\tC1"
    assert lines[2] == "origin\tuk\tfr\tuk"
    assert lines[3].startswith("00a\t")
    # transposed: metadata become columns (lib/KMerDB.ml:1038-1053)
    filt_t = TableFilter(print_metadata=True, transpose=True)
    db.to_table(str(tmp_path / "TT"), filt_t)
    tl = open(str(tmp_path / "TT.KPopCounter.txt")).read().splitlines()
    assert tl[0] == "\tclass\torigin\t00a\t00b\t00c"
    assert tl[1].split("\t")[:3] == ["S1", "C1", "uk"]


def test_table_without_row_names(tmp_path):
    db = make_db()
    filt = TableFilter(print_row_names=False)
    db.to_table(str(tmp_path / "T"), filt)
    lines = open(str(tmp_path / "T.KPopCounter.txt")).read().splitlines()
    assert lines[0] == "S1\tS2\tS3"  # no leading tab
    assert "\t" in lines[1] and not lines[1].startswith("00")
