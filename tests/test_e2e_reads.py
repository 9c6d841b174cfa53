"""Larger-scope acceptance tests mirroring the reference's worked examples:

- a sequencing-reads classifier (the NGS-TB workload shape, reference README
  §5.1.1): simulated genomes -> FASTQ reads -> per-sample spectra -> class
  representatives -> twist -> classify held-out samples;
- the relatedness engine (README §5.2): all-pairs twisted distances over
  many samples + pseudo-phylogenetic splits, checking that family structure
  is recovered.
"""

import io
import os
import subprocess

import numpy as np
import pytest

from kpop_tpu.core.count import count_reads
from kpop_tpu.core.counter_db import CounterDB
from kpop_tpu.core.kmers import KmerSpace
from kpop_tpu.core.matrix import KPopMatrix, MatrixType
from kpop_tpu.core.space import Distance, Metric, get_distance_rowwise, get_embeddings, summarize_rowwise_typed
from kpop_tpu.core.splits import get_splits
from kpop_tpu.core.twister import TwistParameters, twist_counter_db
from kpop_tpu.io.reads import SingleEndFastqInput

BASES = np.array(list("ACGT"))


def mutate(rng, g, n):
    g = g.copy()
    pos = rng.choice(len(g), size=n, replace=False)
    g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
    return g


def reads_of_genome(rng, genome, read_len=120, coverage=4.0):
    n_reads = int(len(genome) * coverage / read_len)
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    return ["".join(BASES[genome[s : s + read_len]]) for s in starts]


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write("@r%d\n%s\n+\n%s\n" % (i, r, "I" * len(r)))


def spectrum_text(space, label, inputs):
    buf = io.StringIO()
    count_reads(inputs, space, buf, label=label)
    return buf.getvalue()


def test_reads_classifier(tmp_path):
    rng = np.random.default_rng(11)
    k, n_classes, L = 8, 6, 3000
    space = KmerSpace("DNA-ds", k)
    root = rng.integers(0, 4, size=L)
    ancestors = [mutate(rng, root, 300) for _ in range(n_classes)]

    db = CounterDB()
    test_samples = []
    meta_lines = ["label\tclass"]
    for c in range(n_classes):
        for s in range(3):  # 2 train + 1 test per class
            genome = mutate(rng, ancestors[c], 30)
            reads = reads_of_genome(rng, genome)
            path = str(tmp_path / f"s{c}_{s}.fastq")
            write_fastq(path, reads)
            name = f"S{c}_{s}"
            if s < 2:
                db.add_spectra_stream(
                    io.StringIO(
                        spectrum_text(space, name, [SingleEndFastqInput(path)])
                    )
                )
                meta_lines.append(f"{name}\tC{c}")
            else:
                test_samples.append((name, path, f"C{c}"))
    meta_path = tmp_path / "meta.txt"
    meta_path.write_text("\n".join(meta_lines) + "\n")
    db.add_meta(str(meta_path))
    # combine per class (the -c action) and twist
    db2 = db.split_spectra("class", "mean")
    assert db2.n_cols == n_classes
    twister, twisted, _ = twist_counter_db(db2, TwistParameters())
    # project test samples and classify
    spectra_path = tmp_path / "test.KPopSpectra.txt"
    with open(spectra_path, "w") as f:
        for name, path, _cls in test_samples:
            f.write(spectrum_text(space, name, [SingleEndFastqInput(path)]))
    projected = twister.add_twisted_from_files(
        KPopMatrix(MatrixType.TWISTED), [str(spectra_path)]
    )
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    lines = summarize_rowwise_typed(
        Distance.of_string("euclidean"), metric, twisted, projected
    )
    truth = {name: cls for name, _p, cls in test_samples}
    miscls = [
        ln.split("\t")[0]
        for ln in lines
        if ln.split("\t")[5] != truth[ln.split("\t")[0]]
    ]
    assert miscls == [], f"misclassified: {miscls}"


def test_relatedness_engine(tmp_path):
    rng = np.random.default_rng(5)
    k, n_families, per_family, L = 7, 5, 8, 2000
    space = KmerSpace("DNA-ds", k)
    root = rng.integers(0, 4, size=L)
    families = [mutate(rng, root, 250) for _ in range(n_families)]
    db = CounterDB()
    sample_family = {}
    for fi, fam in enumerate(families):
        for s in range(per_family):
            name = f"F{fi}_{s}"
            genome = mutate(rng, fam, 20)
            seq = "".join(BASES[genome])
            codes, counts = __import__(
                "kpop_tpu.core.count", fromlist=["spectrum_of_sequences"]
            ).spectrum_of_sequences(space, [seq])
            buf = "\t%s\n" % name + "".join(
                "%s\t%d\n" % (space.code_to_hex(cd), ct)
                for cd, ct in zip(codes, counts)
            )
            db.add_spectra_stream(io.StringIO(buf))
            sample_family[name] = fi
    twister, twisted, _ = twist_counter_db(db, TwistParameters())
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    dist = Distance.of_string("euclidean")
    dm = get_distance_rowwise(dist, metric, twisted, twisted)
    data = np.asarray(dm.matrix.data)
    names = dm.matrix.row_names
    # nearest non-self neighbour must be in the same family, for every sample
    for i, name in enumerate(names):
        row = data[i].copy()
        row[i] = np.inf
        nn = names[int(np.argmin(row))]
        assert sample_family[nn] == sample_family[name], (name, nn)
    # splits from embeddings: the top gaps split should separate families
    emb = get_embeddings(dist, metric, twisted)
    splits = get_splits("gaps", 10, emb)
    assert len(splits.splits) == 10
    members, _w = splits.splits[0]
    fams = {sample_family[names[i]] for i in members}
    other = {sample_family[names[i]] for i in range(len(names)) if i not in members}
    assert fams.isdisjoint(other) or len(fams) < n_families


def test_paired_end_mismatch_is_fatal(tmp_path):
    """Paired FASTQ files of different lengths are a file-format violation
    and must be fatal (reference drives both segments as one record,
    bin/KPopCount.ml:36-55) — not silently truncated to the shorter file."""
    from kpop_tpu.io.reads import PairedEndFastqInput, iter_reads

    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=2000)
    r1 = reads_of_genome(rng, g, coverage=1.0)
    r2 = reads_of_genome(rng, g, coverage=1.0)
    p1, p2 = str(tmp_path / "a_1.fastq"), str(tmp_path / "a_2.fastq")
    write_fastq(p1, r1)
    write_fastq(p2, r2[:-3])  # drop trailing mates
    with pytest.raises(ValueError, match="paired-end FASTQ files do not"):
        list(iter_reads([PairedEndFastqInput(p1, p2)]))
    # equal-length pairing still yields one record per pair
    write_fastq(p2, r2)
    recs = list(iter_reads([PairedEndFastqInput(p1, p2)]))
    assert len(recs) == len(r1)
    assert all(len(segs) == 2 for _tag, segs in recs)
    # CLI surface: the violation must surface as the reference's FATAL UX
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    write_fastq(p2, r2[:-3])
    env = dict(os.environ, PYTHONPATH=repo)
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        [sys.executable, "-m", "kpop_tpu.cli.count", "-k", "5", "-L",
         "-p", p1, p2, "-o", str(tmp_path / "out")],
        env=env, capture_output=True, text=True,
    )
    assert res.returncode != 0
    assert "FATAL" in res.stderr and "paired-end" in res.stderr


def test_gzip_inputs_transparent(tmp_path):
    """.gz FASTA/FASTQ are accepted directly (reference workflows feed
    gzipped FASTQ via zcat pipes, README.md:693-699) and must produce
    byte-identical spectra to the uncompressed files."""
    import gzip
    import sys

    rng = np.random.default_rng(1)
    g = rng.integers(0, 4, size=3000)
    reads = reads_of_genome(rng, g, coverage=2.0)
    fq = str(tmp_path / "s.fastq")
    write_fastq(fq, reads)
    with open(fq, "rb") as f, gzip.open(fq + ".gz", "wb") as z:
        z.write(f.read())
    fa = str(tmp_path / "s.fasta")
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(">r%d\n%s\n" % (i, r))
    with open(fa, "rb") as f, gzip.open(fa + ".gz", "wb") as z:
        z.write(f.read())

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    env.setdefault("JAX_PLATFORMS", "cpu")

    def run_count(args):
        res = subprocess.run(
            [sys.executable, "-m", "kpop_tpu.cli.count", "-k", "5", "-L",
             "-o", "/dev/stdout"] + args,
            env=env, capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return res.stdout

    assert run_count(["-s", fq + ".gz"]) == run_count(["-s", fq])
    assert run_count(["-f", fa + ".gz"]) == run_count(["-f", fa])
    # the parallel input pipeline's native batch parser path too
    from kpop_tpu.parallel.input import encode_fasta_batches

    plain = [
        (c.copy(), list(n))
        for c, n in encode_fasta_batches([fa], batch=8, max_len=128)
    ]
    zipped = [
        (c.copy(), list(n))
        for c, n in encode_fasta_batches([fa + ".gz"], batch=8, max_len=128)
    ]
    assert len(plain) == len(zipped)
    for (ca, na), (cb, nb) in zip(plain, zipped):
        np.testing.assert_array_equal(ca, cb)
        assert na == nb
