"""K-mer-sharded fused serving (parallel/serving.py): the twister rows
partitioned over the mesh's "kmer" axis with psum-combined projection, so
the reference's flagship vocabulary sizes (README.md:1023-1054, tens of GB
of twister) fit a mesh that a replicated layout cannot.  Parity target: the
host float64 chain and the unsharded device pipeline."""

import io
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")


@pytest.fixture(scope="module")
def jnp():
    from kpop_tpu.config import jax_setup

    jax_setup()
    import jax.numpy as jnp

    return jnp


def _random_seqs(rng, n, L):
    return ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(n)]


def _train_db(rng, space, n_classes=6, seqs_per_class=3, L=200):
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB

    db = CounterDB()
    for c in range(n_classes):
        seqs = _random_seqs(rng, seqs_per_class, L)
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(io.StringIO(
            "\tC%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(cd)), ct)
                for cd, ct in zip(codes, counts))))
    return db


@pytest.mark.parametrize("k", [5, 18])
def test_sharded_dmat_matches_unsharded(jnp, k):
    """Both vocabulary representations — dense LUT (k=5) and two-limb
    cuckoo (k=18) — must produce identical distances with the twister
    sharded P('kmer', None) over a (data=2, kmer=4) mesh."""
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.twister import twist_counter_db
    from kpop_tpu.ops.encode import encode_reads_host
    from kpop_tpu.ops.pipeline import (
        build_classifier_params,
        count_spectra,
        distances_to_classes,
        project,
    )
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS, make_mesh
    from kpop_tpu.parallel.serving import (
        shard_classifier_params,
        sharded_dmat_fn,
    )
    import jax
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(7 + k)
    space = KmerSpace("DNA-ds", k)
    twister, twisted, _ = twist_counter_db(_train_db(rng, space))
    params = build_classifier_params(
        space, twister, np.asarray(twisted.matrix.data)
    )

    batch = encode_reads_host(_random_seqs(rng, 5, 150))
    want = np.asarray(distances_to_classes(
        params, project(params, count_spectra(params, jnp.asarray(batch)))
    ))

    mesh = make_mesh(8, data_parallel=2)
    sharded, v_global = shard_classifier_params(params, mesh)
    # the big tensor is genuinely model-sharded, not replicated
    assert sharded.twister.sharding.spec == P(KMER_AXIS, None)
    assert v_global == params.twister.shape[0]
    per_dev_rows = {
        s.data.shape[0] for s in sharded.twister.addressable_shards
    }
    assert per_dev_rows == {sharded.twister.shape[0] // 4}
    assert sharded.twister.shape[0] % 4 == 0  # padded to the kmer axis

    fn = sharded_dmat_fn(mesh, v_global)
    pad = (-batch.shape[0]) % mesh.shape[DATA_AXIS]
    bpad = np.concatenate(
        [batch, np.full((pad, batch.shape[1]), -1, np.int8)]
    ) if pad else batch
    got = np.asarray(fn(sharded, jnp.asarray(bpad)))[: batch.shape[0]]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # padded query rows (all -1 codes) produce empty spectra, not garbage
    if pad:
        tail = np.asarray(fn(sharded, jnp.asarray(bpad)))[batch.shape[0]:]
        assert np.isfinite(tail).all()


def test_choose_kmer_parallel():
    from kpop_tpu.parallel.serving import choose_kmer_parallel

    GB = 1 << 30
    assert choose_kmer_parallel(1 * GB, 8, 8 * GB) == 1
    assert choose_kmer_parallel(9 * GB, 8, 8 * GB) == 2
    assert choose_kmer_parallel(30 * GB, 8, 8 * GB) == 4
    assert choose_kmer_parallel(100 * GB, 8, 8 * GB) == 8
    # even fully sharded it does not fit: least-bad = full sharding
    assert choose_kmer_parallel(1000 * GB, 8, 8 * GB) == 8


def _sh(cmd: str, cwd, env_extra=None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PATH"] = BIN + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = REPO
    env.setdefault("JAX_PLATFORMS", "cpu")
    if env_extra:
        env.update(env_extra)
    res = subprocess.run(
        ["bash", "-c", cmd], cwd=str(cwd), env=env, capture_output=True,
        text=True,
    )
    assert res.returncode == 0, f"{cmd}\n{res.stderr[-2000:]}"
    return res


def test_classify_kmer_parallel_cli_matches_host_chain(tmp_path):
    """kpop-classify --kmer-parallel 4 on the 8-device CPU mesh must match
    the host float64 chain byte-for-class and to float32 tolerance on the
    digest columns (the VERDICT round-2 'done' criterion)."""
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(23)
    k = 7
    space = KmerSpace("DNA-ds", k)
    bases = np.array(list("ACGT"))
    fams = [rng.integers(0, 4, size=500) for _ in range(4)]

    def mut(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
        return g

    db = CounterDB()
    for fi, fam in enumerate(fams):
        seqs = ["".join(bases[mut(fam, 12)]) for _ in range(3)]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    (tmp_path / "test.fasta").write_text("\n".join(
        ">T%d-F%d\n%s" % (i, i % 4, "".join(bases[mut(fams[i % 4], 12)]))
        for i in range(6)
    ) + "\n")
    _sh("kpop-twist -i DB -o TW", tmp_path)
    _sh(
        "kpop-count -k %d -L -f test.fasta -o /dev/stdout | "
        "kpop-twistdb -i T TW -k /dev/stdin -o t Q && "
        "kpop-twistdb -i T TW -i t TW -s Q HostSum" % k,
        tmp_path,
    )
    res = _sh(
        "kpop-classify -T TW -t TW --kmer-parallel 4 -v -f test.fasta "
        "-o DevSum", tmp_path,
    )
    assert "kmer-parallel 4" in res.stderr
    host = sorted((tmp_path / "HostSum.KPopSummary.txt").read_text().splitlines())
    dev = sorted((tmp_path / "DevSum.KPopSummary.txt").read_text().splitlines())
    assert len(host) == len(dev) == 6
    for lh, ld in zip(host, dev):
        ph, pd = lh.split("\t"), ld.split("\t")
        assert ph[0] == pd[0]
        assert ph[5] == pd[5], f"class mismatch {ph[0]}: {pd[5]} != {ph[5]}"
        for a, b in zip(pd[1:5], ph[1:5]):
            assert abs(float(a) - float(b)) < 5e-4 * max(1.0, abs(float(b)))


def test_classify_auto_sharding_by_budget(tmp_path):
    """With a deliberately tiny KPOP_PARAMS_HBM_BYTES the automatic layout
    must pick kmer sharding (and still produce a valid summary)."""
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(29)
    space = KmerSpace("DNA-ds", 6)
    db = CounterDB()
    for c in range(3):
        seqs = _random_seqs(rng, 2, 300)
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(io.StringIO(
            "\tC%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(cd)), ct)
                for cd, ct in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    (tmp_path / "q.fasta").write_text(
        ">q0\n%s\n" % _random_seqs(rng, 1, 200)[0]
    )
    _sh("kpop-twist -i DB -o TW", tmp_path)
    res = _sh(
        "kpop-classify -T TW -t TW -v -f q.fasta -o Sum", tmp_path,
        env_extra={"KPOP_PARAMS_HBM_BYTES": "1024"},
    )
    assert "kmer-parallel 8" in res.stderr
    lines = (tmp_path / "Sum.KPopSummary.txt").read_text().splitlines()
    assert len(lines) == 1 and lines[0].startswith("q0\t")


def test_sharded_bf16_matches_f32_predictions(jnp):
    """bf16 twister storage composes with kmer sharding: the psum
    accumulates f32 partials, so predictions must match f32 exactly on
    well-separated classes and distances stay within bf16 tolerance."""
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.twister import twist_counter_db
    from kpop_tpu.ops.encode import encode_reads_host
    from kpop_tpu.ops.pipeline import build_classifier_params
    from kpop_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from kpop_tpu.parallel.serving import (
        shard_classifier_params,
        sharded_dmat_fn,
    )

    rng = np.random.default_rng(31)
    space = KmerSpace("DNA-ds", 6)
    twister, twisted, _ = twist_counter_db(_train_db(rng, space))
    coords = np.asarray(twisted.matrix.data)
    p32 = build_classifier_params(space, twister, coords)
    pbf = build_classifier_params(space, twister, coords, dtype=jnp.bfloat16)

    mesh = make_mesh(8, data_parallel=2)
    batch = encode_reads_host(_random_seqs(rng, 4, 150))
    pad = (-batch.shape[0]) % mesh.shape[DATA_AXIS]
    if pad:
        batch = np.concatenate(
            [batch, np.full((pad, batch.shape[1]), -1, np.int8)]
        )
    bd = jnp.asarray(batch)
    s32, v = shard_classifier_params(p32, mesh)
    sbf, v2 = shard_classifier_params(pbf, mesh)
    assert v == v2 and str(sbf.twister.dtype) == "bfloat16"
    d32 = np.asarray(sharded_dmat_fn(mesh, v)(s32, bd))[:4]
    dbf = np.asarray(sharded_dmat_fn(mesh, v)(sbf, bd))[:4]
    np.testing.assert_array_equal(d32.argmin(axis=1), dbf.argmin(axis=1))
    np.testing.assert_allclose(dbf, d32, rtol=0.03, atol=0.02)
