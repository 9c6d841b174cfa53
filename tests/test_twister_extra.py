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
