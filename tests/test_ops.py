"""Device kernels (ops/) must agree with the host numpy golden paths."""

import numpy as np
import pytest

from kpop_tpu.core.ca import fit_ca
from kpop_tpu.core.kmers import KmerSpace, encode_dna
from kpop_tpu.core.space import Distance, Metric, distance_rowwise, normalizations
from kpop_tpu.core.matrix import NamedMatrix


@pytest.fixture(scope="module")
def jnp():
    from kpop_tpu.config import jax_setup

    jax_setup()
    import jax.numpy as jnp

    return jnp


def random_seqs(rng, n, length):
    return [
        "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=length))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k,canonical", [(5, True), (5, False), (11, True)])
def test_window_codes_batch_matches_host(jnp, k, canonical):
    from kpop_tpu.ops.encode import encode_reads_host, window_codes_batch

    rng = np.random.default_rng(0)
    seqs = random_seqs(rng, 7, 60)
    space = KmerSpace("DNA-ds" if canonical else "DNA-ss", k)
    batch = encode_reads_host(seqs)
    codes, ok = window_codes_batch(jnp.asarray(batch), k, canonical)
    codes, ok = np.asarray(codes), np.asarray(ok)
    for i, s in enumerate(seqs):
        want = space.window_codes(encode_dna(s))
        got = codes[i][ok[i]]
        assert got.tolist() == want.tolist()


def test_spectra_from_codes_matches_host(jnp):
    from kpop_tpu.ops.encode import (
        encode_reads_host,
        spectra_from_codes,
        window_codes_batch,
    )

    rng = np.random.default_rng(1)
    seqs = random_seqs(rng, 5, 80)
    space = KmerSpace("DNA-ds", 4)
    batch = encode_reads_host(seqs)
    codes, ok = window_codes_batch(jnp.asarray(batch), 4, True)
    spectra = np.asarray(spectra_from_codes(codes, ok, space.n_kmers))
    for i, s in enumerate(seqs):
        want = np.zeros(space.n_kmers)
        wc = space.window_codes(encode_dna(s))
        np.add.at(want, wc.astype(np.int64), 1)
        np.testing.assert_array_equal(spectra[i], want)


def test_full_pipeline_matches_host_projection(jnp):
    """count_spectra + project must equal Twister.project_entries."""
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.twister import twist_counter_db
    from kpop_tpu.ops.encode import encode_reads_host
    from kpop_tpu.ops.pipeline import (
        build_classifier_params,
        count_spectra,
        distances_to_classes,
        project,
    )

    rng = np.random.default_rng(2)
    space = KmerSpace("DNA-ds", 5)
    # build a small training DB of 6 "classes"
    db = CounterDB()
    import io

    for c in range(6):
        seqs = random_seqs(rng, 3, 150)
        codes, counts = spectrum_of_sequences(space, seqs)
        buf = "\t%s\n" % ("C%d" % c) + "".join(
            "%s\t%d\n" % (space.code_to_hex(cd), ct)
            for cd, ct in zip(codes, counts)
        )
        db.add_spectra_stream(io.StringIO(buf))
    twister, twisted, _ = twist_counter_db(db)
    params = build_classifier_params(
        space, twister, np.asarray(twisted.matrix.data)
    )
    # query sequences
    queries = random_seqs(rng, 4, 120)
    batch = encode_reads_host(queries)
    spectra = count_spectra(params, jnp.asarray(batch))
    got = np.asarray(project(params, spectra))
    # host path
    entries = []
    for s in queries:
        codes, counts = spectrum_of_sequences(space, [s])
        entries.append(
            [(space.code_to_hex(cd), float(ct)) for cd, ct in zip(codes, counts)]
        )
    want = twister.project_entries(entries)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)

    # distances must match the host rowwise computation
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    dist = Distance.of_string("euclidean")
    dmat_dev = np.asarray(distances_to_classes(params, jnp.asarray(got)))
    m1 = NamedMatrix(
        list(twisted.matrix.row_names),
        list(twisted.matrix.col_names),
        np.asarray(twisted.matrix.data),
    )
    m2 = NamedMatrix(
        [f"q{i}" for i in range(4)], list(twisted.matrix.col_names), want
    )
    dmat_host = distance_rowwise(dist, metric, m1, m2).data
    np.testing.assert_allclose(dmat_dev, dmat_host, rtol=2e-4, atol=1e-6)


def test_summarize_batch_semantics(jnp):
    from kpop_tpu.ops.pipeline import summarize_batch

    rng = np.random.default_rng(3)
    dmat = rng.random((6, 9))
    mean, std, med, mad, top, idx = [
        np.asarray(x) for x in summarize_batch(jnp.asarray(dmat), 2)
    ]
    np.testing.assert_allclose(mean, dmat.mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(
        std,
        np.sqrt(((dmat - dmat.mean(axis=1, keepdims=True)) ** 2).sum(axis=1) / 8),
        rtol=1e-6,
    )
    srt = np.sort(dmat, axis=1)
    np.testing.assert_allclose(med, srt[:, 4], rtol=1e-6)
    np.testing.assert_allclose(top, srt[:, :2], rtol=1e-6)
    for i in range(6):
        assert dmat[i, idx[i, 0]] == srt[i, 0]
