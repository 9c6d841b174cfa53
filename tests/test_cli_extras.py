"""CLI coverage beyond the quick start: protein/DNA-ss content, paired-end
FASTQ, -M eviction duplicates, markdown help, error UX, jax CA backend."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")


def sh(cmd: str, cwd, check=True) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PATH"] = BIN + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = REPO
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        ["bash", "-c", cmd], cwd=str(cwd), env=env, capture_output=True,
        text=True,
    )
    if check:
        assert res.returncode == 0, f"{cmd}\n{res.stderr[-2000:]}"
    return res


def test_protein_content(tmp_path):
    (tmp_path / "p.fasta").write_text(">p1\nACDEFGHIKLMNPQRSTVWY\n")
    out = sh(
        "kpop-count -k 3 -C protein -l prot -f p.fasta -o /dev/stdout",
        tmp_path,
    ).stdout
    lines = out.splitlines()
    assert lines[0] == "\tprot"
    assert len(lines) == 1 + 18  # 18 distinct 3-mers in a 20-mer
    # labels are fixed-width hex over base-20 codes
    assert all(len(ln.split("\t")[0]) == len(lines[1].split("\t")[0])
               for ln in lines[1:])


def test_dna_ss_differs_from_ds(tmp_path):
    (tmp_path / "s.fasta").write_text(">s\nAAAATTTT\n")
    ds = sh("kpop-count -k 4 -C DNA-ds -l x -f s.fasta -o /dev/stdout", tmp_path).stdout
    ss = sh("kpop-count -k 4 -C DNA-ss -l x -f s.fasta -o /dev/stdout", tmp_path).stdout
    # double-stranded canonicalization merges AAAA/TTTT
    assert ds != ss
    assert "\n00\t" in ds  # AAAA canonical (code 0, 2 hex digits at k=4)


def test_paired_end_fastq(tmp_path):
    (tmp_path / "r1.fastq").write_text("@r1\nACGTACGT\n+\nIIIIIIII\n")
    (tmp_path / "r2.fastq").write_text("@r1\nTTTTACGT\n+\nIIIIIIII\n")
    out = sh(
        "kpop-count -k 4 -l pe -p r1.fastq r2.fastq -o /dev/stdout", tmp_path
    ).stdout
    assert out.startswith("\tpe\n")
    assert len(out.splitlines()) > 2


def test_max_results_size_eviction_accumulates_downstream(tmp_path):
    # tiny -M forces dumps; duplicate hashes in the stream are legal and
    # must accumulate when ingested (reference bin/KPopCount.ml:116-123)
    (tmp_path / "s.fasta").write_text(">a\nACGTACGTACGT\n>b\nACGTACGTACGT\n")
    evicted = sh(
        "kpop-count -k 2 -M 2 -l x -f s.fasta -o /dev/stdout", tmp_path
    ).stdout
    normal = sh(
        "kpop-count -k 2 -l x -f s.fasta -o /dev/stdout", tmp_path
    ).stdout
    assert evicted != normal  # eviction produced duplicate hash lines
    from kpop_tpu.core.counter_db import CounterDB

    db1, db2 = CounterDB(), CounterDB()
    db1.add_spectra_stream(io.StringIO(evicted))
    db2.add_spectra_stream(io.StringIO(normal))
    assert db1.row_names and sorted(db1.row_names) == sorted(db2.row_names)
    for name in db1.row_names:
        i1 = db1.row_names.index(name)
        i2 = db2.row_names.index(name)
        assert db1.counts[i1, 0] == db2.counts[i2, 0]


def test_markdown_and_error_ux(tmp_path):
    md = sh("kpop-twistdb --markdown", tmp_path).stdout
    assert md.startswith("## `KPopTwistDB`")
    assert "| Option |" in md
    res = sh("kpop-countdb -i /nonexistent", tmp_path, check=False)
    assert res.returncode == 1
    assert "FATAL: Uncaught exception" in res.stderr
    res_x = sh("kpop-countdb -x -i /nonexistent", tmp_path, check=False)
    assert "Traceback" in res_x.stderr


def test_twist_jax_backend_matches_host(tmp_path):
    sys.path.insert(0, REPO)
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.count import spectrum_of_sequences

    rng = np.random.default_rng(0)
    space = KmerSpace("DNA-ds", 5)
    db = CounterDB()
    for c in range(6):
        seqs = ["".join(np.array(list("ACGT"))[rng.integers(0, 4, 200)])
                for _ in range(2)]
        codes, counts = spectrum_of_sequences(space, seqs)
        buf = "\tC%d\n" % c + "".join(
            "%s\t%d\n" % (space.code_to_hex(cd), ct)
            for cd, ct in zip(codes, counts))
        db.add_spectra_stream(io.StringIO(buf))
    db.to_binary(str(tmp_path / "DB"))
    sh("kpop-twist -i DB -o HOST --backend host", tmp_path)
    sh("kpop-twist -i DB -o JAX --backend jax", tmp_path)
    from kpop_tpu.core.twister import Twister

    th = Twister.of_binary(str(tmp_path / "HOST"))
    tj = Twister.of_binary(str(tmp_path / "JAX"))
    np.testing.assert_allclose(
        tj.inertia.matrix.data, th.inertia.matrix.data, rtol=1e-3, atol=1e-6
    )
    dh = np.asarray(th.twister.matrix.data)
    dj = np.asarray(tj.twister.matrix.data)
    for j in range(dh.shape[0]):
        sign = 1.0 if np.dot(dh[j], dj[j]) >= 0 else -1.0
        np.testing.assert_allclose(dj[j], sign * dh[j], rtol=2e-2, atol=2e-4)


def test_protein_classification_pipeline(tmp_path):
    """Full pipeline on protein content: 4 protein families, classify
    held-out members (exercises the base-20 code space end to end)."""
    rng = np.random.default_rng(3)
    alpha = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    families = [rng.integers(0, 20, size=120) for _ in range(4)]

    def mutate(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 20, size=n)) % 20
        return g

    train = tmp_path / "train"
    train.mkdir()
    lines_test = []
    for fi, fam in enumerate(families):
        seqs = []
        for s in range(6):
            p = "".join(alpha[mutate(fam, 6)])
            if s < 4:
                seqs.append(">%d_%d\n%s" % (fi, s, p))
            else:
                lines_test.append(">T%d_%d-F%d\n%s" % (fi, s, fi, p))
        (train / ("f%d.fasta" % fi)).write_text("\n".join(seqs) + "\n")
    (tmp_path / "test.fasta").write_text("\n".join(lines_test) + "\n")
    for fi in range(4):
        sh(
            "kpop-count -k 3 -C protein -L -f train/f%d.fasta -o /dev/stdout | "
            "kpop-countdb -k /dev/stdin -R '~.' -A F%d -L F%d -N -D -t T%d"
            % (fi, fi, fi, fi),
            tmp_path,
        )
    sh(
        "cat T0.KPopCounter.txt T1.KPopCounter.txt T2.KPopCounter.txt "
        "T3.KPopCounter.txt | kpop-countdb -k /dev/stdin -o Classes && "
        "kpop-twist -i Classes -o Classes",
        tmp_path,
    )
    sh(
        "kpop-count -k 3 -C protein -L -f test.fasta -o /dev/stdout | "
        "kpop-twistdb -i T Classes -k /dev/stdin -o t /dev/stdout | "
        "kpop-twistdb -i T Classes -i t Classes -s /dev/stdin Pred",
        tmp_path,
    )
    mis = 0
    for ln in (tmp_path / "Pred.KPopSummary.txt").read_text().splitlines():
        p = ln.split("\t")
        if p[0].split("-")[1] != p[5]:
            mis += 1
    assert mis == 0


def test_cosine_and_minkowski_summaries(tmp_path):
    rng = np.random.default_rng(4)
    import io as _io
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.count import spectrum_of_sequences

    space = KmerSpace("DNA-ds", 5)
    db = CounterDB()
    for c in range(5):
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 400)])
        codes, counts = spectrum_of_sequences(space, [seq])
        db.add_spectra_stream(_io.StringIO(
            "\tS%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(cd), ct)
                for cd, ct in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    sh("kpop-twist -i DB -o TW", tmp_path)
    for dist in ("cosine", "minkowski(3)"):
        sh(
            "kpop-twistdb -i T TW -i t TW --distance '%s' -s TW S_%s"
            % (dist, dist.replace("(", "").replace(")", "")),
            tmp_path,
        )
    cos = (tmp_path / "S_cosine.KPopSummary.txt").read_text().splitlines()
    mink = (tmp_path / "S_minkowski3.KPopSummary.txt").read_text().splitlines()
    assert len(cos) == len(mink) == 5
    # self-distance 0 -> nearest target is self under any metric
    for ln in cos + mink:
        p = ln.split("\t")
        assert p[0] == p[5]
        assert float(p[6]) < 1e-10


def test_centroids_splits_cli(tmp_path):
    rng = np.random.default_rng(6)
    import io as _io
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace
    from kpop_tpu.core.count import spectrum_of_sequences

    space = KmerSpace("DNA-ds", 5)
    db = CounterDB()
    for c in range(6):
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 300)])
        codes, counts = spectrum_of_sequences(space, [seq])
        db.add_spectra_stream(_io.StringIO(
            "\tS%d\n" % c + "".join(
                "%s\t%d\n" % (space.code_to_hex(cd), ct)
                for cd, ct in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    sh("kpop-twist -i DB -o TW", tmp_path)
    sh(
        "kpop-twistdb -i T TW -i t TW -e --splits-algorithm centroids -p "
        "-O s SP",
        tmp_path,
    )
    lines = (tmp_path / "SP.PhyloSplits.txt").read_text().splitlines()
    assert len(lines) >= 6  # recursive bipartition down to singletons


def test_classify_protein_and_minkowski(tmp_path):
    """kpop-classify host fallback paths: protein content and non-euclidean
    distance must match the twistdb chain."""
    rng = np.random.default_rng(9)
    alpha = np.array(list("ACDEFGHIKLMNPQRSTVWY"))
    fams = [rng.integers(0, 20, size=100) for _ in range(3)]

    def mut(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 20, size=n)) % 20
        return g

    import io as _io
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.kmers import KmerSpace

    space = KmerSpace("protein", 3)
    db = CounterDB()
    for fi, fam in enumerate(fams):
        seqs = ["".join(alpha[mut(fam, 5)]) for _ in range(3)]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(_io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    tests_fa = "\n".join(
        ">T%d-F%d\n%s" % (i, i % 3, "".join(alpha[mut(fams[i % 3], 5)]))
        for i in range(9)
    )
    (tmp_path / "test.fasta").write_text(tests_fa + "\n")
    sh("kpop-twist -i DB -o TW", tmp_path)
    # protein (k=3 fits the device path: base-20 codes) + minkowski (host)
    for extra, name in (("", "P1"), ("--distance 'minkowski(3)'", "P2")):
        sh(
            "kpop-classify -T TW -t TW -C protein -f test.fasta %s -o %s"
            % (extra, name),
            tmp_path,
        )
        lines = (tmp_path / (name + ".KPopSummary.txt")).read_text().splitlines()
        assert len(lines) == 9
        for ln in lines:
            p = ln.split("\t")
            assert p[5] == p[0].split("-")[1], ln


def test_classify_large_k_device_matches_host_chain(tmp_path):
    """k=16 (beyond any dense-LUT 4^k table) must run the fused device path
    (two-limb codes + sorted-vocab search) and agree with the host float64
    chain kpop-count | kpop-twistdb -k | -s (reference README.md:93)."""
    import io as _io

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(17)
    k = 16
    space = KmerSpace("DNA-ds", k)
    bases = np.array(list("ACGT"))
    fams = [rng.integers(0, 4, size=600) for _ in range(4)]

    def mut(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
        return g

    db = CounterDB()
    for fi, fam in enumerate(fams):
        seqs = ["".join(bases[mut(fam, 15)]) for _ in range(3)]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(_io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    tests_fa = "\n".join(
        ">T%d-F%d\n%s" % (i, i % 4, "".join(bases[mut(fams[i % 4], 15)]))
        for i in range(8)
    )
    (tmp_path / "test.fasta").write_text(tests_fa + "\n")
    sh("kpop-twist -i DB -o TW", tmp_path)
    # host chain: count -> project (project_entries) -> summarize
    sh(
        "kpop-count -k %d -L -f test.fasta -o /dev/stdout | "
        "kpop-twistdb -i T TW -k /dev/stdin -o t Q && "
        "kpop-twistdb -i T TW -i t TW -s Q HostSum" % k,
        tmp_path,
    )
    # fused device path (k inferred from labels must resolve to 16)
    sh("kpop-classify -T TW -t TW -f test.fasta -o DevSum", tmp_path)
    host = sorted((tmp_path / "HostSum.KPopSummary.txt").read_text().splitlines())
    dev = sorted((tmp_path / "DevSum.KPopSummary.txt").read_text().splitlines())
    assert len(host) == len(dev) == 8
    for lh, ld in zip(host, dev):
        ph, pd = lh.split("\t"), ld.split("\t")
        assert ph[0] == pd[0]
        assert ph[5] == pd[5], f"class mismatch {ph[0]}: {pd[5]} != {ph[5]}"
        for a, b in zip(pd[1:5], ph[1:5]):
            # device distances are float32; host chain is float64
            assert abs(float(a) - float(b)) < 5e-4 * max(1.0, abs(float(b)))


def test_classify_k_inference_validation(tmp_path):
    """Explicit -k inconsistent with the twister's labels must fail loudly
    (hex width is not injective in k; silent misclassification is worse)."""
    import io as _io

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(23)
    space = KmerSpace("DNA-ds", 6)
    bases = np.array(list("ACGT"))
    db = CounterDB()
    for i in range(3):
        seqs = ["".join(bases[rng.integers(0, 4, size=200)])]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(_io.StringIO(
            "\tS%d\n" % i + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    (tmp_path / "t.fasta").write_text(
        ">q\n%s\n" % "".join(bases[rng.integers(0, 4, size=100)]))
    sh("kpop-twist -i DB -o TW", tmp_path)
    # wrong k: width of k=6 labels is 3 hex digits; k=9 expects 5
    res = sh(
        "kpop-classify -T TW -t TW -k 9 -f t.fasta -o X", tmp_path,
        check=False,
    )
    assert res.returncode != 0
    assert "inconsistent" in (res.stderr + res.stdout)
    # k=6 k-mers use codes >= 4^5, so inference is unambiguous here
    sh("kpop-classify -T TW -t TW -f t.fasta -o OK", tmp_path)
    assert (tmp_path / "OK.KPopSummary.txt").exists()


def test_classify_dtype_bf16_cli(tmp_path):
    """kpop-classify --dtype bf16 (bf16 twister storage, f32 accumulation)
    must predict the same classes as the f32 run."""
    import io as _io

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(23)
    k = 6
    space = KmerSpace("DNA-ds", k)
    bases = np.array(list("ACGT"))
    fams = [rng.integers(0, 4, size=500) for _ in range(5)]

    def mut(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
        return g

    db = CounterDB()
    for fi, fam in enumerate(fams):
        seqs = ["".join(bases[mut(fam, 12)]) for _ in range(3)]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(_io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    (tmp_path / "test.fasta").write_text("\n".join(
        ">T%d-F%d\n%s" % (i, i % 5, "".join(bases[mut(fams[i % 5], 10)]))
        for i in range(10)) + "\n")
    sh("kpop-twist -i DB -o TW", tmp_path)
    sh("kpop-classify -T TW -t TW -f test.fasta -o F32", tmp_path)
    sh("kpop-classify -T TW -t TW --dtype bf16 -f test.fasta -o BF16", tmp_path)
    f32 = sorted((tmp_path / "F32.KPopSummary.txt").read_text().splitlines())
    bf16 = sorted((tmp_path / "BF16.KPopSummary.txt").read_text().splitlines())
    assert len(f32) == len(bf16) == 10
    for lf, lb in zip(f32, bf16):
        pf, pb = lf.split("\t"), lb.split("\t")
        assert pf[0] == pb[0] and pf[5] == pb[5]
        # bf16 distances agree to bf16 resolution
        for a, b in zip(pb[1:5], pf[1:5]):
            assert abs(float(a) - float(b)) < 2e-2 * max(1.0, abs(float(b)))


def test_classify_cosine_device_matches_host_chain(tmp_path):
    """--distance cosine now runs the fused device path (the reference
    treats the distance family uniformly, lib/Space.ml:150-205); output
    must match the host float64 chain with --distance cosine."""
    import io as _io

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(23)
    k = 6
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
        db.add_spectra_stream(_io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    tests_fa = "\n".join(
        ">T%d-F%d\n%s" % (i, i % 4, "".join(bases[mut(fams[i % 4], 12)]))
        for i in range(8)
    )
    (tmp_path / "test.fasta").write_text(tests_fa + "\n")
    sh("kpop-twist -i DB -o TW", tmp_path)
    sh(
        "kpop-count -k %d -L -f test.fasta -o /dev/stdout | "
        "kpop-twistdb -i T TW -k /dev/stdin -o t Q && "
        "kpop-twistdb -i T TW -i t TW --distance cosine -s Q HostSum" % k,
        tmp_path,
    )
    sh(
        "kpop-classify -T TW -t TW --distance cosine -f test.fasta -o DevSum",
        tmp_path,
    )
    host = sorted((tmp_path / "HostSum.KPopSummary.txt").read_text().splitlines())
    dev = sorted((tmp_path / "DevSum.KPopSummary.txt").read_text().splitlines())
    assert len(host) == len(dev) == 8
    for lh, ld in zip(host, dev):
        ph, pd = lh.split("\t"), ld.split("\t")
        assert ph[0] == pd[0]
        assert ph[5::3] == pd[5::3], f"targets mismatch {ph[0]}"
        for a, b in zip(pd[1:], ph[1:]):
            try:
                fa, fb = float(a), float(b)
            except ValueError:
                continue
            assert abs(fa - fb) < 5e-4 * max(1.0, abs(fb)), (ld, lh)


def test_classify_project_path_bag_matches_dense(tmp_path):
    """kpop-classify --project-path bag (embedding-bag gather, no spectrum
    materialization) must write the same summary as the dense scatter path
    up to f32 noise — same classes, same line structure."""
    import io as _io

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    rng = np.random.default_rng(31)
    k = 6
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
        db.add_spectra_stream(_io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    (tmp_path / "test.fasta").write_text("\n".join(
        ">T%d-F%d\n%s" % (i, i % 4, "".join(bases[mut(fams[i % 4], 10)]))
        for i in range(8)) + "\n")
    sh("kpop-twist -i DB -o TW", tmp_path)
    sh("kpop-classify -T TW -t TW --project-path dense -f test.fasta -o D",
       tmp_path)
    sh("kpop-classify -T TW -t TW --project-path bag -f test.fasta -o G",
       tmp_path)
    dn = (tmp_path / "D.KPopSummary.txt").read_text().splitlines()
    bg = (tmp_path / "G.KPopSummary.txt").read_text().splitlines()
    assert len(dn) == len(bg) == 8
    for a, b in zip(sorted(dn), sorted(bg)):
        pa, pb = a.split("\t"), b.split("\t")
        assert pa[0] == pb[0] and pa[5::3] == pb[5::3], (a, b)
        for fa, fb in zip(pa[1:5], pb[1:5]):
            assert abs(float(fa) - float(fb)) < 2e-4 * max(
                1.0, abs(float(fb))
            )


def test_classify_shape_buckets_mixed_lengths(tmp_path):
    """The serve loop buckets jit shapes (widths rounded up to 512, rows
    padded to the full batch): a stream with mixed/growing read lengths
    and a short tail batch must produce the same per-sequence summaries
    as classifying everything in one batch."""
    rng = np.random.default_rng(5)
    bases = np.array(list("ACGT"))

    def mut(g, n):
        g = g.copy()
        pos = rng.choice(len(g), size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
        return g

    from kpop_tpu.core.count import spectrum_of_sequences
    from kpop_tpu.core.counter_db import CounterDB
    from kpop_tpu.core.kmers import KmerSpace

    space = KmerSpace("DNA-ds", 5)
    fams = [rng.integers(0, 4, size=600) for _ in range(3)]
    db = CounterDB()
    for fi, f in enumerate(fams):
        seqs = ["".join(bases[mut(f, 8)]) for _ in range(3)]
        codes, counts = spectrum_of_sequences(space, seqs)
        db.add_spectra_stream(io.StringIO(
            "\tF%d\n" % fi + "".join(
                "%s\t%d\n" % (space.code_to_hex(int(c)), v)
                for c, v in zip(codes, counts))))
    db.to_binary(str(tmp_path / "DB"))
    sh("kpop-twist -i DB -o TW", tmp_path)
    # 7 queries of growing lengths (crossing several 512-buckets) -> with
    # --batch 2: three full batches + a 1-row tail
    lens = [300, 350, 800, 900, 1500, 200, 2100]
    recs = []
    for i, L in enumerate(lens):
        g = mut(fams[i % 3], 6)
        g = np.tile(g, -(-L // len(g)))[:L]
        recs.append(">q%d-F%d\n%s" % (i, i % 3, "".join(bases[g])))
    (tmp_path / "q.fasta").write_text("\n".join(recs) + "\n")
    sh("kpop-classify -T TW -t TW -f q.fasta --batch 2 -o Chunked", tmp_path)
    sh("kpop-classify -T TW -t TW -f q.fasta --batch 100 -o Whole", tmp_path)
    a = sorted((tmp_path / "Chunked.KPopSummary.txt").read_text().splitlines())
    b = sorted((tmp_path / "Whole.KPopSummary.txt").read_text().splitlines())
    assert len(a) == len(b) == len(lens)
    for la, lb in zip(a, b):
        pa, pb = la.split("\t"), lb.split("\t")
        assert pa[0] == pb[0] and pa[5] == pb[5], (la, lb)
        for fa, fb in zip(pa[1:5], pb[1:5]):
            assert abs(float(fa) - float(fb)) < 1e-4 * max(
                1.0, abs(float(fb))
            )
