"""Phylogeny-driven regression workloads (SURVEY.md §4, VERDICT item 8).

The reference regenerates its acceptance datasets by simulating genomes down
committed Newick trees and ART Illumina reads (test/clusters-tb.R:19-52,
test/clusters-covid.R:27-37) and reports 95.3% lineage accuracy at covid
scale (README.md:1083-1085).  Python equivalents live in tests/data/phylo.py;
here we pin:

- a covid-shaped workload — many sibling classes whose between-class
  divergence (~1.0%) barely exceeds the within-class divergence (~0.6%) —
  with accuracy >= 0.95 (measured 0.99 at the pinned seed),
- a TB-shaped workload — genomes down a tree, paired-end simulated reads,
  per-sample spectra -> class representatives -> classify held-out samples,
- the full-scale quick start (1000 sequences, the reference's README.md:94
  scale; the fast e2e test runs 200) with the canonical 0-misclassified
  invariant.
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "data"))

import phylo  # noqa: E402

from kpop_tpu.core.count import count_reads, spectrum_of_sequences  # noqa: E402
from kpop_tpu.core.counter_db import CounterDB  # noqa: E402
from kpop_tpu.core.kmers import KmerSpace  # noqa: E402
from kpop_tpu.core.matrix import KPopMatrix, MatrixType  # noqa: E402
from kpop_tpu.core.space import (  # noqa: E402
    Distance,
    Metric,
    summarize_rowwise_typed,
)
from kpop_tpu.core.twister import TwistParameters, twist_counter_db  # noqa: E402
from kpop_tpu.io.reads import PairedEndFastqInput  # noqa: E402


# ---------------- simulator unit tests ----------------


def test_newick_roundtrip():
    s = "((1-1:0.12,2-1:0.3):1.5,(3-2:0.2,(4-2:0.1,5-2:0.11):0.05):2);"
    t = phylo.parse_newick(s)
    tips = [n.name for n in t.tips()]
    assert tips == ["1-1", "2-1", "3-2", "4-2", "5-2"]
    assert phylo.parse_newick(phylo.write_newick(t)).tips()[0].length == 0.12
    # the generated random tree round-trips too
    rng = np.random.default_rng(0)
    t2 = phylo.random_clade_tree(rng, 3, 4)
    s2 = phylo.write_newick(t2)
    t3 = phylo.parse_newick(s2)
    assert [n.name for n in t3.tips()] == [n.name for n in t2.tips()]


def test_jc69_divergence():
    """Observed substitution fraction along one branch must match the JC69
    expectation 3/4 (1 - exp(-4/3 rate t))."""
    rng = np.random.default_rng(1)
    L = 200_000
    root = rng.integers(0, 4, size=L)
    t = 0.5
    rate = 0.1
    tree = phylo.Node(children=[phylo.Node(name="x", length=t)])
    seq = phylo.sim_seq(rng, tree, root, rate=rate)["x"]
    expected = 0.75 * (1.0 - np.exp(-4.0 / 3.0 * rate * t))
    got = (seq != root).mean()
    assert abs(got - expected * 2 / 3) > 0  # sanity: not zero
    # sites hit by the mutation draw change to a uniformly random OTHER base,
    # so the observed difference equals the hit probability exactly
    assert got == pytest.approx(expected, rel=0.05)


def test_paired_reads_shape():
    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, size=5000)
    r1, r2 = phylo.sim_paired_reads(rng, genome, read_len=150, coverage=10.0)
    assert len(r1) == len(r2) == int(5000 * 10 / 300)
    assert all(len(r) == 150 for r in r1 + r2)
    # read 2 is the reverse complement of the fragment 3' end: its revcomp
    # must appear (nearly) verbatim in the genome when errors are disabled
    r1c, r2c = phylo.sim_paired_reads(
        rng, genome, read_len=50, coverage=0.1, error_rate=0.0
    )
    g = phylo.codes_to_str(genome)
    comp = str.maketrans("ACGT", "TGCA")
    for fwd, rev in zip(r1c, r2c):
        assert fwd in g
        assert rev.translate(comp)[::-1] in g


# ---------------- covid-shaped accuracy regression ----------------


def _spectrum_buf(space, name, seq_str):
    codes, counts = spectrum_of_sequences(space, [seq_str])
    return "\t%s\n" % name + "".join(
        "%s\t%d\n" % (space.code_to_hex(cd), ct)
        for cd, ct in zip(codes, counts)
    )


def test_covid_shape_accuracy(tmp_path):
    """20 sibling classes, within-class divergence ~0.6% vs between ~1.0%:
    accuracy pinned >= 0.95 (README.md:1083-1085 reports 95.3% at full covid
    scale; this seed measures 0.99)."""
    rng = np.random.default_rng(2026)
    n_classes, tips, L, k = 20, 10, 2000, 8
    tree = phylo.random_clade_tree(
        rng, n_classes, tips, between=0.08, within=0.15
    )
    root = rng.integers(0, 4, size=L)
    seqs = phylo.sim_seq(rng, tree, root, rate=0.01)
    assert len(seqs) == n_classes * tips
    space = KmerSpace("DNA-ds", k)
    db = CounterDB()
    meta = ["label\tclass"]
    test = []
    by_class = {}
    for n in sorted(
        seqs, key=lambda s: (int(s.split("-")[1]), int(s.split("-")[0]))
    ):
        by_class.setdefault(n.split("-")[1], []).append(n)
    for c, members in by_class.items():
        half = len(members) // 2  # first half train (clusters-covid.R:34-36)
        for i, n in enumerate(members):
            s = phylo.codes_to_str(seqs[n])
            if i < half:
                db.add_spectra_stream(io.StringIO(_spectrum_buf(space, n, s)))
                meta.append(f"{n}\tC{c}")
            else:
                test.append((n, s, f"C{c}"))
    meta_path = tmp_path / "meta.txt"
    meta_path.write_text("\n".join(meta) + "\n")
    db.add_meta(str(meta_path))
    db2 = db.split_spectra("class", "mean")
    assert db2.n_cols == n_classes
    twister, twisted, _ = twist_counter_db(db2, TwistParameters())
    spath = tmp_path / "test.KPopSpectra.txt"
    with open(spath, "w") as f:
        for n, s, _c in test:
            f.write(_spectrum_buf(space, n, s))
    proj = twister.add_twisted_from_files(
        KPopMatrix(MatrixType.TWISTED), [str(spath)]
    )
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    lines = summarize_rowwise_typed(
        Distance.of_string("euclidean"), metric, twisted, proj, keep_at_most=1
    )
    truth = {n: c for n, _s, c in test}
    ok = sum(1 for ln in lines if ln.split("\t")[5] == truth[ln.split("\t")[0]])
    acc = ok / len(lines)
    assert acc >= 0.95, f"accuracy regression: {acc:.3f} < 0.95"


# ---------------- TB-shaped reads workload ----------------


def test_tb_shape_paired_reads(tmp_path):
    """Genomes down a tree -> paired-end reads -> per-sample spectra ->
    class representatives -> classify held-out samples (the NGS-TB workload,
    test/clusters-tb.R + README §5.1.1)."""
    rng = np.random.default_rng(7)
    n_classes, tips, L, k = 5, 4, 3000, 8
    tree = phylo.random_clade_tree(
        rng, n_classes, tips, between=1.0, within=0.1
    )
    root = rng.integers(0, 4, size=L)
    seqs = phylo.sim_seq(rng, tree, root, rate=0.02)
    space = KmerSpace("DNA-ds", k)
    db = CounterDB()
    meta = ["label\tclass"]
    test = []
    by_class = {}
    for n in seqs:
        by_class.setdefault(n.split("-")[1], []).append(n)
    for c, members in by_class.items():
        for i, n in enumerate(members):
            r1, r2 = phylo.sim_paired_reads(
                rng, seqs[n], read_len=100, coverage=8.0, insert_mean=250.0
            )
            p1 = str(tmp_path / f"{n}_1.fastq")
            p2 = str(tmp_path / f"{n}_2.fastq")
            phylo.write_fastq(p1, r1)
            phylo.write_fastq(p2, r2)
            if i < len(members) // 2:
                buf = io.StringIO()
                count_reads(
                    [PairedEndFastqInput(p1, p2)], space, buf, label=n
                )
                db.add_spectra_stream(io.StringIO(buf.getvalue()))
                meta.append(f"{n}\tC{c}")
            else:
                test.append((n, p1, p2, f"C{c}"))
    meta_path = tmp_path / "meta.txt"
    meta_path.write_text("\n".join(meta) + "\n")
    db.add_meta(str(meta_path))
    db2 = db.split_spectra("class", "mean")
    twister, twisted, _ = twist_counter_db(db2, TwistParameters())
    spath = tmp_path / "test.KPopSpectra.txt"
    with open(spath, "w") as f:
        for n, p1, p2, _c in test:
            buf = io.StringIO()
            count_reads([PairedEndFastqInput(p1, p2)], space, buf, label=n)
            f.write(buf.getvalue())
    proj = twister.add_twisted_from_files(
        KPopMatrix(MatrixType.TWISTED), [str(spath)]
    )
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    lines = summarize_rowwise_typed(
        Distance.of_string("euclidean"), metric, twisted, proj, keep_at_most=1
    )
    truth = {n: c for n, *_rest, c in test}
    miscls = [
        ln.split("\t")[0]
        for ln in lines
        if ln.split("\t")[5] != truth[ln.split("\t")[0]]
    ]
    assert miscls == [], f"misclassified: {miscls}"


# ---------------- full-scale quick start (1000 sequences) ----------------


def test_quickstart_full_scale(tmp_path):
    """The reference quick start counts 1000 sequences (500 test,
    README.md:94); the fast e2e test runs 200.  Run the full scale through
    the real CLI pipeline and require the canonical 0-misclassified."""
    data_gen = os.path.join(HERE, "data", "make_clusters.py")
    subprocess.run(
        [
            sys.executable,
            data_gen,
            str(tmp_path / "clusters-small.fasta"),
            "--per-class",
            "100",
        ],
        check=True,
    )
    env = dict(os.environ)
    env["PATH"] = os.path.join(os.path.dirname(HERE), "bin") + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = os.path.dirname(HERE)
    env.setdefault("JAX_PLATFORMS", "cpu")

    def sh(cmd):
        res = subprocess.run(
            ["bash", "-c", cmd],
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
        )
        assert res.returncode == 0, f"cmd failed: {cmd}\n{res.stderr[-3000:]}"
        return res.stdout

    k = 5
    classes = " ".join("C%d" % i for i in range(1, 11))
    sh(
        "for CLASS in %s; do cat clusters-small.fasta | "
        "awk -v CLASS=$CLASS '{nr=(NR-1)%%4; ok=(nr==0?$0~(\"-\"CLASS\"$\"):nr==1&&ok); if (ok) print}' | "
        "kpop-count -k %d -L -f /dev/stdin | "
        "kpop-countdb -k /dev/stdin -R '~.' -A $CLASS -L $CLASS -N -D -t /dev/stdout; done | "
        "kpop-countdb -k /dev/stdin -o Classes.%d" % (classes, k, k)
    )
    sh("kpop-twist -i Classes.%d -o Classes.%d" % (k, k))
    sh(
        "cat clusters-small.fasta | "
        "awk -v K=%d '{nr=(NR-1)%%4; if (nr==2) split($0,s,\"[>-]\"); if (nr==3) print \">\"s[2]\"-\"s[3]\"\\n\"$0}' | "
        "kpop-count -k %d -L -f /dev/stdin | "
        "kpop-twistdb -i T Classes.%d -k /dev/stdin -o t /dev/stdout | "
        "kpop-twistdb -i T Classes.%d -i t Classes.%d -s /dev/stdin Pred"
        % (k, k, k, k, k)
    )
    summary = (tmp_path / "Pred.KPopSummary.txt").read_text().splitlines()
    assert len(summary) == 500  # 500 held-out test sequences
    bad = [
        ln.split("\t")[0]
        for ln in summary
        if ln.split("\t")[0].split("-")[1] != ln.split("\t")[5]
    ]
    assert bad == [], f"misclassified: {bad}"


def test_covid_shape_read_set_accuracy_unsaturated(tmp_path):
    """VERDICT r4 #8: the same covid-shaped task with LOW-COVERAGE read-set
    queries (art-shaped 150 bp pairs + 0.2% errors, joined with 'N' so the
    window hash counts exactly the per-read k-mers).  Coverage is tuned so
    the pinned seed lands STRICTLY inside (floor, ceiling): the floor
    catches kernel regressions, the ceiling certifies the metric is not
    saturated — an accidental easing of the task (generator change,
    leaking whole genomes) fails the test just like a broken kernel."""
    rng = np.random.default_rng(2027)
    n_classes, tips, L, k = 20, 10, 2000, 8
    tree = phylo.random_clade_tree(
        rng, n_classes, tips, between=0.08, within=0.15
    )
    root = rng.integers(0, 4, size=L)
    seqs = phylo.sim_seq(rng, tree, root, rate=0.01)
    space = KmerSpace("DNA-ds", k)
    db = CounterDB()
    meta = ["label\tclass"]
    test = []
    by_class = {}
    for n in sorted(
        seqs, key=lambda s: (int(s.split("-")[1]), int(s.split("-")[0]))
    ):
        by_class.setdefault(n.split("-")[1], []).append(n)
    for c, members in by_class.items():
        half = len(members) // 2
        for i, n in enumerate(members):
            if i < half:
                s = phylo.codes_to_str(seqs[n])
                db.add_spectra_stream(io.StringIO(_spectrum_buf(space, n, s)))
                meta.append(f"{n}\tC{c}")
            else:
                # held-out tip -> one low-coverage paired-end read set
                r1, r2 = phylo.sim_paired_reads(
                    rng, seqs[n].astype(np.int64), coverage=0.8
                )
                test.append((n, "N".join(r1 + r2), f"C{c}"))
    meta_path = tmp_path / "meta.txt"
    meta_path.write_text("\n".join(meta) + "\n")
    db.add_meta(str(meta_path))
    db2 = db.split_spectra("class", "mean")
    twister, twisted, _ = twist_counter_db(db2, TwistParameters())
    spath = tmp_path / "test.KPopSpectra.txt"
    with open(spath, "w") as f:
        for n, s, _c in test:
            f.write(_spectrum_buf(space, n, s))
    proj = twister.add_twisted_from_files(
        KPopMatrix(MatrixType.TWISTED), [str(spath)]
    )
    metric = twister.metrics_vector(Metric.of_string("powers(1,1,2)"))
    lines = summarize_rowwise_typed(
        Distance.of_string("euclidean"), metric, twisted, proj, keep_at_most=1
    )
    truth = {n: c for n, _s, c in test}
    ok = sum(1 for ln in lines if ln.split("\t")[5] == truth[ln.split("\t")[0]])
    acc = ok / len(lines)
    # pinned seed measures 0.83; floor catches regressions, ceiling
    # catches saturation/easing
    assert 0.72 <= acc <= 0.95, (
        f"read-set accuracy {acc:.3f} left the falsifiable band "
        f"[0.72, 0.95] — kernel regression (low) or saturated/eased task "
        f"(high)"
    )
