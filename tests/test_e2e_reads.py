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
