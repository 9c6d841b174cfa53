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


@pytest.mark.parametrize(
    "content,k",
    [("DNA-ds", 15), ("DNA-ds", 18), ("DNA-ds", 30), ("DNA-ss", 30),
     ("protein", 12)],
)
def test_window_codes_wide_matches_host(jnp, content, k):
    """Two-limb device codes must recombine to the host uint64 codes for
    every k the reference supports (bin/KPopCount.ml:111-115)."""
    from kpop_tpu.core.kmers import encode_protein
    from kpop_tpu.ops.encode import split_k, window_codes_batch_wide

    rng = np.random.default_rng(4)
    space = KmerSpace(content, k)
    if content == "protein":
        alpha = list("ACDEFGHIKLMNPQRSTVWYX")
        seqs = ["".join(rng.choice(alpha, size=50)) for _ in range(5)]
        enc = [encode_protein(s) for s in seqs]
        L = max(len(e) for e in enc)
        batch = np.full((len(enc), L), -1, dtype=np.int8)
        for i, e in enumerate(enc):
            batch[i, : len(e)] = e
        host_enc = enc
    else:
        from kpop_tpu.ops.encode import encode_reads_host

        seqs = random_seqs(rng, 5, 80)
        batch = encode_reads_host(seqs)
        host_enc = [encode_dna(s) for s in seqs]
    hi, lo, ok = window_codes_batch_wide(
        jnp.asarray(batch), k, space.canonical, space.base
    )
    hi, lo, ok = np.asarray(hi), np.asarray(lo), np.asarray(ok)
    _k_hi, k_lo = split_k(k, space.base)
    limb = np.uint64(space.base**k_lo)
    full = hi.astype(np.uint64) * limb + lo.astype(np.uint64)
    for i in range(len(seqs)):
        want = space.window_codes(host_enc[i])
        got = full[i][ok[i][: len(host_enc[i]) - k + 1]] if ok.shape[1] else full[i][ok[i]]
        got = full[i][ok[i]]
        assert got.tolist() == want.tolist()


def test_searchsorted_2limb(jnp):
    from kpop_tpu.ops.encode import searchsorted_2limb

    rng = np.random.default_rng(5)
    V = 1000
    codes = np.unique(
        rng.integers(0, 2**60, size=V * 2, dtype=np.uint64)
    )[:V]
    codes.sort()
    limb = np.uint64(2**30)
    vh = jnp.asarray((codes // limb).astype(np.int32))
    vl = jnp.asarray((codes % limb).astype(np.int32))
    # queries: half present, half absent
    present = rng.choice(codes, size=200)
    absent = rng.integers(0, 2**60, size=200, dtype=np.uint64)
    q = np.concatenate([present, absent])
    got = np.asarray(
        searchsorted_2limb(
            vh, vl,
            jnp.asarray((q // limb).astype(np.int32)),
            jnp.asarray((q % limb).astype(np.int32)),
        )
    )
    want = np.searchsorted(codes, q)
    hit = np.isin(q, codes)
    np.testing.assert_array_equal(got[hit], want[hit])
    assert (got[~hit] == V).all()


@pytest.mark.parametrize("content,k", [("DNA-ds", 18), ("protein", 10)])
def test_wide_pipeline_matches_host_projection(jnp, content, k):
    """The fused large-k path (two-limb codes + sorted-vocab search) must
    reproduce Twister.project_entries bit-for-bit in semantics: unknown
    k-mers dropped, duplicates accumulated, normalization over known."""
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.kmers import encode_protein, hex_labels_vectorized
    from kpop_tpu.core.matrix import KPopMatrix, MatrixType
    from kpop_tpu.core.twister import Twister
    from kpop_tpu.ops.pipeline import (
        build_classifier_params,
        count_spectra,
        project,
        project_reads,
    )

    rng = np.random.default_rng(6)
    space = KmerSpace(content, k)
    if content == "protein":
        alpha = list("ACDEFGHIKLMNPQRSTVWY")
        seqs = ["".join(rng.choice(alpha, size=120)) for _ in range(6)]
        enc = [encode_protein(s) for s in seqs]
        L = max(len(e) for e in enc)
        batch = np.full((len(enc), L), -1, dtype=np.int8)
        for i, e in enumerate(enc):
            batch[i, : len(e)] = e
    else:
        from kpop_tpu.ops.encode import encode_reads_host

        seqs = random_seqs(rng, 6, 150)
        batch = encode_reads_host(seqs)
    # vocabulary: the k-mers of half the sequences (so queries contain
    # unknown k-mers that must silently drop), plus random extra codes
    vocab_codes, _ = spectrum_of_sequences(space, seqs[:3])
    vocab_codes = np.unique(vocab_codes)
    d = 7
    labels = hex_labels_vectorized(vocab_codes, space.hex_width)
    tw_data = rng.standard_normal((d, len(labels)))
    inertia = np.sort(rng.random(d))[::-1]
    dim_names = ["Dim%d" % (i + 1) for i in range(d)]
    twister = Twister(
        KPopMatrix(
            MatrixType.TWISTER,
            NamedMatrix(dim_names, labels, tw_data),
        ),
        KPopMatrix(
            MatrixType.INERTIA,
            NamedMatrix(["inertia"], dim_names, inertia[None, :]),
        ),
    )
    class_coords = rng.standard_normal((4, d))
    params = build_classifier_params(space, twister, class_coords)
    assert params.vocab_lut is None
    assert params.cuckoo is not None or params.vocab_hi is not None
    spectra = count_spectra(params, jnp.asarray(batch))
    got = np.asarray(project(params, spectra))
    got_fused = np.asarray(project_reads(params, jnp.asarray(batch)))
    # host golden
    entries = []
    for s in seqs:
        codes, counts = spectrum_of_sequences(space, [s])
        entries.append(
            [(space.code_to_hex(int(cd)), float(ct)) for cd, ct in zip(codes, counts)]
        )
    want = twister.project_entries(entries)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(got_fused, want, rtol=2e-5, atol=1e-6)


def test_cuckoo_build_and_lookup(jnp):
    """Cuckoo table must resolve every vocabulary key to its index and miss
    on absent keys — the wide-path hot lookup (6 gathers, worst-case)."""
    from kpop_tpu.ops.cuckoo import build_cuckoo, cuckoo_lookup

    rng = np.random.default_rng(7)
    for V in (1, 17, 5000, 100_000):
        codes = np.unique(rng.integers(0, 2**60, size=V * 2, dtype=np.uint64))[:V]
        limb = np.uint64(2**30)
        kh = (codes // limb).astype(np.int32)
        kl = (codes % limb).astype(np.int32)
        built = build_cuckoo(kh, kl)
        assert built is not None, f"build failed at V={V}"
        table, seeds = built
        got = np.asarray(
            cuckoo_lookup(jnp.asarray(table), seeds, V, jnp.asarray(kh), jnp.asarray(kl))
        )
        np.testing.assert_array_equal(got, np.arange(V))
        # absent keys miss
        absent = rng.integers(0, 2**60, size=500, dtype=np.uint64)
        absent = absent[~np.isin(absent, codes)]
        ah = (absent // limb).astype(np.int32)
        al = (absent % limb).astype(np.int32)
        miss = np.asarray(
            cuckoo_lookup(jnp.asarray(table), seeds, V, jnp.asarray(ah), jnp.asarray(al))
        )
        assert (miss == V).all()


def test_bf16_twister_storage_parity(jnp):
    """bf16 twister storage (build_classifier_params(dtype=bfloat16)): all
    accumulations stay f32, so classifications must agree with the f32
    params on a real trained workload and coordinates stay within bf16
    resolution."""
    import io

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

    rng = np.random.default_rng(7)
    space = KmerSpace("DNA-ds", 6)
    db = CounterDB()
    ancestors = [rng.integers(0, 4, size=400) for _ in range(8)]
    for c, anc in enumerate(ancestors):
        seqs = []
        for _ in range(3):
            g = anc.copy()
            pos = rng.choice(400, size=12, replace=False)
            g[pos] = (g[pos] + rng.integers(1, 4, size=12)) % 4
            seqs.append("".join(np.array(list("ACGT"))[g]))
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(io.StringIO(
            "\tC%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(cd), ct)
                for cd, ct in zip(codes, counts))))
    twister, twisted, _ = twist_counter_db(db)
    coords = np.asarray(twisted.matrix.data)
    p32 = build_classifier_params(space, twister, coords)
    pbf = build_classifier_params(
        space, twister, coords, dtype=jnp.bfloat16
    )
    assert pbf.twister.dtype == jnp.bfloat16
    assert pbf.metric.dtype == jnp.float32
    queries = []
    truth = []
    for c, anc in enumerate(ancestors):
        g = anc.copy()
        pos = rng.choice(400, size=10, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=10)) % 4
        queries.append("".join(np.array(list("ACGT"))[g]))
        truth.append(c)
    batch = jnp.asarray(encode_reads_host(queries))

    def predict(params):
        spectra = count_spectra(params, batch)
        tw = project(params, spectra)
        assert tw.dtype == jnp.float32  # f32 accumulation regardless
        return np.asarray(distances_to_classes(params, tw)).argmin(axis=1)

    pred32 = predict(p32)
    predbf = predict(pbf)
    np.testing.assert_array_equal(pred32, predbf)
    np.testing.assert_array_equal(pred32, np.asarray(truth))
