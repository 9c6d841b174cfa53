import io

import numpy as np
import pytest

from kpop_tpu.core.matrix import KPopMatrix, MatrixType, NamedMatrix
from kpop_tpu.core.splits import Splits
from kpop_tpu.core.twister import Twister
from kpop_tpu.io import framed
from kpop_tpu.io.spectra import iter_spectra
from kpop_tpu.utils.quoting import QuotesInName, strip_external_quotes_and_check


def test_quoting():
    assert strip_external_quotes_and_check('"abc"') == "abc"
    assert strip_external_quotes_and_check("abc") == "abc"
    with pytest.raises(QuotesInName):
        strip_external_quotes_and_check('a"b')


def test_matrix_text_roundtrip():
    m = NamedMatrix(
        ["s1", "s2"],
        ["Dim1", "Dim2", "Dim3"],
        np.array([[1.5, -2.25, 0.001], [3.0, 4.0, -5.5]]),
    )
    buf = io.StringIO()
    m.write_text(buf)
    buf.seek(0)
    lines = buf.getvalue().splitlines()
    assert lines[0] == '""\t"Dim1"\t"Dim2"\t"Dim3"'
    assert lines[1].startswith('"s1"\t1.5\t-2.25\t0.001')
    buf.seek(0)
    m2 = NamedMatrix.read_text(buf)
    assert m2.row_names == m.row_names
    assert m2.col_names == m.col_names
    np.testing.assert_allclose(m2.data, m.data)


def test_matrix_text_reads_r_fwrite_variants():
    # data.table::fwrite(keep.rownames=TRUE) emits an "rn" first column
    text = '"rn"\t"Dim1"\t"Dim2"\n"a"\t1\t2\n"b"\t3\t4\n'
    m = NamedMatrix.read_text(io.StringIO(text))
    assert m.col_names == ["Dim1", "Dim2"]
    assert m.row_names == ["a", "b"]
    # header without the leading dummy cell (fwrite row.names=TRUE)
    text2 = '"Dim1"\t"Dim2"\n"a"\t1\t2\n'
    m2 = NamedMatrix.read_text(io.StringIO(text2))
    assert m2.col_names == ["Dim1", "Dim2"]


def test_matrix_binary_roundtrip(tmp_path):
    m = KPopMatrix(
        MatrixType.TWISTED,
        NamedMatrix(["a"], ["Dim1"], np.array([[2.5]])),
    )
    prefix = str(tmp_path / "x")
    m.to_binary(prefix)
    m2 = KPopMatrix.of_binary(MatrixType.TWISTED, prefix)
    assert m2.matrix.row_names == ["a"]
    np.testing.assert_allclose(m2.matrix.data, m.matrix.data)
    # wrong type must fail (typed register contract)
    import shutil

    shutil.copy(
        str(tmp_path / "x.KPopTwisted"), str(tmp_path / "y.KPopDMatrix")
    )
    with pytest.raises(framed.IncompatibleArchive):
        KPopMatrix.of_binary(MatrixType.DMATRIX, str(tmp_path / "y"))


def test_binary_is_pipe_friendly(tmp_path):
    """The framed format must be readable from a non-seekable stream."""
    import subprocess, sys

    m = KPopMatrix(
        MatrixType.TWISTED, NamedMatrix(["a"], ["Dim1"], np.array([[1.0]]))
    )
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from kpop_tpu.core.matrix import KPopMatrix, MatrixType;"
        "m = KPopMatrix.of_binary(MatrixType.TWISTED, '/dev/stdin');"
        "print(m.matrix.row_names[0])" % "/root/repo"
    )
    prefix = str(tmp_path / "p")
    m.to_binary(prefix)
    with open(prefix + ".KPopTwisted", "rb") as f:
        out = subprocess.run(
            [sys.executable, "-c", code],
            stdin=f,
            capture_output=True,
            text=True,
            check=True,
        )
    assert out.stdout.strip() == "a"


def test_spectra_iteration_and_duplicates():
    text = "\tA\n00a\t1\n00a\t2\n\tB\n00b\t3\n"
    got = list(iter_spectra(io.StringIO(text)))
    assert got[0][0] == "A"
    assert got[0][1] == [("00a", 1.0), ("00a", 2.0)]
    assert got[1] == ("B", [("00b", 3.0)])


def test_twister_roundtrip(tmp_path):
    tw = Twister(
        KPopMatrix(
            MatrixType.TWISTER,
            NamedMatrix(["Dim1", "Dim2"], ["00a", "00b", "00c"], np.arange(6.0).reshape(2, 3)),
        ),
        KPopMatrix(
            MatrixType.INERTIA,
            NamedMatrix(["inertia"], ["Dim1", "Dim2"], np.array([[0.7, 0.3]])),
        ),
    )
    prefix = str(tmp_path / "t")
    tw.to_binary(prefix)
    tw2 = Twister.of_binary(prefix)
    assert tw2.dim_names == ["Dim1", "Dim2"]
    np.testing.assert_allclose(tw2.twister.matrix.data, tw.twister.matrix.data)
    tw.to_files(prefix)
    tw3 = Twister.of_files(prefix)
    np.testing.assert_allclose(tw3.inertia.matrix.data, tw.inertia.matrix.data)


def test_splits_roundtrip(tmp_path):
    s = Splits(["a", "b", "c"])
    s.add_split([0, 2], 1.25)
    s.add_split([1], 0.5)
    prefix = str(tmp_path / "s")
    s.to_file(prefix)
    s2 = Splits.of_file(prefix)
    assert s2.element_names == ["a", "b", "c"]
    assert s2.splits[0] == (frozenset({0, 2}), 1.25)
    s.to_binary(prefix)
    s3 = Splits.of_binary(prefix)
    assert s3.splits == s.splits


def test_merge_rowwise():
    a = KPopMatrix(
        MatrixType.TWISTED, NamedMatrix(["x"], ["Dim1"], np.array([[1.0]]))
    )
    b = KPopMatrix(
        MatrixType.TWISTED, NamedMatrix(["y"], ["Dim1"], np.array([[2.0]]))
    )
    m = a.merge_rowwise(b)
    assert m.matrix.row_names == ["x", "y"]
    empty = KPopMatrix(MatrixType.TWISTED)
    assert empty.merge_rowwise(a).matrix.row_names == ["x"]
