"""Vectorized host projection: parity with a naive transcription of
lib/Twister.ml:146-188 (unknown-drop, duplicate-accumulate, normalize over
found mass only), including empty and all-unknown spectra and the blocked
matmul path."""

import numpy as np

from kpop_tpu.core.matrix import KPopMatrix, MatrixType, NamedMatrix
from kpop_tpu.core.twister import Twister


def make_twister(rng, d=4, kmers=("AAA", "AAC", "CCA", "GTT", "TTT")):
    kmers = list(kmers)
    return Twister(
        KPopMatrix(
            MatrixType.TWISTER,
            NamedMatrix(
                [f"Dim{i+1}" for i in range(d)],
                kmers,
                rng.standard_normal((d, len(kmers))),
            ),
        ),
        KPopMatrix(
            MatrixType.INERTIA,
            NamedMatrix(
                ["inertia"],
                [f"Dim{i+1}" for i in range(d)],
                np.sort(rng.random(d))[::-1][None, :],
            ),
        ),
    )


def naive_project(tw: Twister, entries_list, normalize=True):
    kmer_idx = {n: i for i, n in enumerate(tw.kmer_names)}
    m = np.asarray(tw.twister.matrix.data, dtype=np.float64)
    out = np.zeros((len(entries_list), m.shape[0]))
    for si, entries in enumerate(entries_list):
        x = np.zeros(m.shape[1])
        acc = 0.0
        for name, v in entries:
            idx = kmer_idx.get(name)
            if idx is not None:
                acc += v
                x[idx] += v
        if normalize and acc != 0.0:
            x /= acc
        out[si] = m @ x
    return out


def test_project_entries_semantics():
    rng = np.random.default_rng(3)
    tw = make_twister(rng)
    entries_list = [
        [("AAA", 2.0), ("CCA", 1.0), ("AAA", 3.0)],  # duplicate accumulates
        [("ZZZ", 5.0), ("GTT", 4.0)],  # unknown dropped, excluded from norm
        [],  # empty spectrum -> zero row
        [("QQQ", 1.0)],  # all-unknown -> acc 0, no normalization division
        [("TTT", 7.0), ("AAC", 0.5), ("TTT", -1.0)],
    ]
    for normalize in (True, False):
        got = tw.project_entries(entries_list, normalize=normalize)
        want = naive_project(tw, entries_list, normalize=normalize)
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-15)


def test_project_entries_many_spectra_blocked():
    """Enough spectra and k-mers that the blocked scatter covers >1 block
    boundary path (block size derives from the vocabulary size)."""
    rng = np.random.default_rng(4)
    vocab = ["".join(rng.choice(list("ACGT"), size=6)) for _ in range(300)]
    vocab = sorted(set(vocab))
    tw = make_twister(rng, d=5, kmers=vocab)
    entries_list = []
    for _ in range(200):
        n = int(rng.integers(0, 20))
        entries = [
            (
                vocab[int(rng.integers(len(vocab)))]
                if rng.random() < 0.8
                else "UNKNOWN%d" % rng.integers(10),
                float(rng.integers(1, 50)),
            )
            for _ in range(n)
        ]
        entries_list.append(entries)
    want = naive_project(tw, entries_list)
    got = tw.project_entries(entries_list)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    # force many small blocks (7 spectra per block) and check identity
    got_blocked = tw.project_entries(
        entries_list, block_elements=7 * len(vocab)
    )
    np.testing.assert_allclose(got_blocked, want, rtol=1e-12, atol=1e-14)


def test_project_entries_empty_batch():
    rng = np.random.default_rng(5)
    tw = make_twister(rng)
    out = tw.project_entries([])
    assert out.shape == (0, 4)


def test_project_entries_debug_lines(capsys):
    """--debug-twisting emits one DEBUG=(lines=...) line per spectrum
    (reference lib/Twister.ml:147,171-187 shape)."""
    import sys

    rng = np.random.default_rng(6)
    tw = make_twister(rng)
    entries_list = [[("AAA", 1.0)], [("CCA", 2.0), ("GTT", 1.0)]]
    tw.project_entries(entries_list, debug=True)
    err = capsys.readouterr().err
    lines = [ln for ln in err.splitlines() if ln.startswith("DEBUG=(")]
    assert len(lines) == 2
    assert lines[0].startswith("DEBUG=(lines=1/5/4,")
    assert lines[1].startswith("DEBUG=(lines=2/5/4,")


def test_twist_counter_db_n_dims_truncation():
    """TwistParameters.n_dims (kpop-twist --dims) keeps only the leading
    CA dimensions on both backends; inertia is each dim's share of the
    FULL non-trivial spectrum (matches the untruncated fit's leading
    entries), and the truncated twister projects consistently."""
    import io

    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.twister import TwistParameters, twist_counter_db

    rng = np.random.default_rng(3)
    space = KmerSpace("DNA-ds", 5)
    db = CounterDB()
    for c in range(6):
        codes = rng.choice(space.n_kmers, size=120, replace=False)
        counts = rng.integers(1, 40, size=120)
        db.add_spectra_stream(io.StringIO(
            "\tS%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(cd)), v)
                for cd, v in zip(codes, counts))))
    full_tw, full_coords, _ = twist_counter_db(db)
    for backend in ("host", "sharded"):
        params = TwistParameters(n_dims=2)
        tw, coords, _ = twist_counter_db(db, params, backend=backend)
        assert len(tw.dim_names) == 2
        assert np.asarray(coords.matrix.data).shape == (6, 2)
        inertia = np.asarray(tw.inertia.matrix.data).ravel()
        full_inertia = np.asarray(full_tw.inertia.matrix.data).ravel()
        np.testing.assert_allclose(
            inertia, full_inertia[:2], rtol=1e-5, atol=1e-8
        )
        for j in range(2):
            a = np.asarray(coords.matrix.data)[:, j]
            b = np.asarray(full_coords.matrix.data)[:, j]
            sign = 1.0 if float(a @ b) >= 0 else -1.0
            np.testing.assert_allclose(a, sign * b, rtol=1e-4, atol=1e-6)


def test_twist_cli_dims_option(tmp_path):
    """kpop-twist --dims N writes an N-dim twister/twisted pair."""
    import io

    from kpop_tpu.cli.twist import main as twist_main
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(4)
    space = KmerSpace("DNA-ds", 5)
    db = CounterDB()
    for c in range(5):
        codes = rng.choice(space.n_kmers, size=80, replace=False)
        counts = rng.integers(1, 30, size=80)
        db.add_spectra_stream(io.StringIO(
            "\tS%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(cd)), v)
                for cd, v in zip(codes, counts))))
    pre = str(tmp_path / "toy")
    db.to_binary(pre)
    assert twist_main(["-i", pre, "-o", pre, "--dims", "3"]) == 0
    out = Twister.of_binary(pre)
    assert len(out.dim_names) == 3
