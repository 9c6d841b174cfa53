"""End-to-end acceptance test: the reference README quick start
(README.md:84-139), driven through the real CLIs with the same shell
pipeline (pipes over /dev/stdin//dev/stdout), on generated data.

Invariant: ">>> Misclassified sequences: 0" (README.md:94,137).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "bin")
DATA_GEN = os.path.join(REPO, "tests", "data", "make_clusters.py")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    td = tmp_path_factory.mktemp("quickstart")
    subprocess.run(
        [sys.executable, DATA_GEN, str(td / "clusters-small.fasta")],
        check=True,
    )
    return td


def sh(cmd: str, cwd) -> str:
    env = dict(os.environ)
    env["PATH"] = BIN + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = REPO
    env.setdefault("JAX_PLATFORMS", "cpu")
    res = subprocess.run(
        ["bash", "-c", cmd],
        cwd=str(cwd),
        env=env,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, f"cmd failed: {cmd}\n{res.stderr[-3000:]}"
    return res.stdout


@pytest.fixture(scope="module")
def trained(workdir):
    """Steps 1-2 of the quick start (train DB + twist), built once so every
    test in this module is independently runnable (not ordered after the
    full-pipeline test)."""
    k = 5
    if not (workdir / ("Classes.%d.KPopTwisted" % k)).exists():
        classes = " ".join("C%d" % i for i in range(1, 11))
        sh(
            "for CLASS in %s; do cat clusters-small.fasta | "
            "awk -v CLASS=$CLASS '{nr=(NR-1)%%4; ok=(nr==0?$0~(\"-\"CLASS\"$\"):nr==1&&ok); if (ok) print}' | "
            "kpop-count -k %d -L -f /dev/stdin | "
            "kpop-countdb -k /dev/stdin -R '~.' -A $CLASS -L $CLASS -N -D -t /dev/stdout; done | "
            "kpop-countdb -k /dev/stdin -o Classes.%d" % (classes, k, k),
            workdir,
        )
        sh("kpop-twist -i Classes.%d -o Classes.%d" % (k, k), workdir)
        # 3. project test sequences + summarize (README.md:93)
        sh(
            "cat clusters-small.fasta | "
            "awk -v K=%d '{nr=(NR-1)%%4; if (nr==2) split($0,s,\"[>-]\"); if (nr==3) print \">\"s[2]\"-\"s[3]\"\\n\"$0}' | "
            "kpop-count -k %d -L -f /dev/stdin | "
            "kpop-twistdb -i T Classes.%d -k /dev/stdin -o t /dev/stdout | "
            "kpop-twistdb -i T Classes.%d -i t Classes.%d -s /dev/stdin Test_prediction.%d"
            % (k, k, k, k, k, k),
            workdir,
        )
    return workdir


def test_quickstart_zero_misclassified(trained):
    workdir = trained
    k = 5
    assert (workdir / ("Classes.%d.KPopCounter" % k)).exists()
    assert (workdir / ("Classes.%d.KPopTwister" % k)).exists()
    assert (workdir / ("Classes.%d.KPopTwisted" % k)).exists()
    # 4. count misclassified (README.md:94)
    out = sh(
        "cat Test_prediction.%d.KPopSummary.txt | "
        "awk -F '\\t' 'BEGIN{OFS=\"\\t\"} {sub(\"-\",\"\\t\",$1); print}' | "
        "awk -F '\\t' '{if ($2!=$7) print}' | wc -l" % k,
        workdir,
    )
    assert out.strip() == "0", f"misclassified: {out.strip()}"
    # sanity: all 100 test sequences are present in the summary
    n_lines = sh("wc -l < Test_prediction.%d.KPopSummary.txt" % k, workdir)
    assert int(n_lines.strip()) == 100


def test_text_binary_conversion_roundtrip(trained):
    workdir = trained
    k = 5
    sh("kpop-twistdb -i t Classes.%d -O t Classes.%d" % (k, k), workdir)
    header = sh("head -1 Classes.%d.KPopTwisted.txt" % k, workdir)
    assert header.startswith('""\t"Dim1"\t"Dim2"')
    # re-encode text -> binary -> text and compare
    sh(
        "kpop-twistdb -I t Classes.%d -o t RT && "
        "kpop-twistdb -i t RT -O t RT" % k,
        workdir,
    )
    a = (workdir / ("Classes.%d.KPopTwisted.txt" % k)).read_text()
    b = (workdir / "RT.KPopTwisted.txt").read_text()
    assert a == b


def test_distances_and_summary_from_register(trained):
    workdir = trained
    k = 5
    sh(
        "kpop-twistdb -i t Classes.%d -i T Classes.%d -d Classes.%d "
        "-O d D -o d D -S S1" % (k, k, k),
        workdir,
    )
    # distance matrix is 10x10 with zero diagonal
    lines = (workdir / "D.KPopDMatrix.txt").read_text().splitlines()
    assert len(lines) == 11
    # summary from the distance register matches summary computed directly
    sh(
        "kpop-twistdb -i T Classes.%d -i t Classes.%d -s Classes.%d S2"
        % (k, k, k),
        workdir,
    )
    s1 = (workdir / "S1.KPopSummary.txt").read_text()
    s2 = (workdir / "S2.KPopSummary.txt").read_text()
    assert s1 == s2


def test_embeddings_and_splits(trained):
    workdir = trained
    k = 5
    sh(
        "kpop-twistdb -i T Classes.%d -i t Classes.%d -e -p "
        "-O e E -o s SP -O s SP" % (k, k),
        workdir,
    )
    e = (workdir / "E.KPopVectors.txt").read_text().splitlines()
    assert len(e) == 11
    sp = (workdir / "SP.PhyloSplits.txt").read_text().splitlines()
    assert len(sp) >= 2
    assert (workdir / "SP.PhyloSplits").exists()


def test_metrics_output(trained):
    workdir = trained
    k = 5
    sh("kpop-twistdb -i T Classes.%d -O m M" % k, workdir)
    lines = (workdir / "M.KPopMetrics.txt").read_text().splitlines()
    assert lines[1].startswith('"metrics"')
    vals = [float(x) for x in lines[1].split("\t")[1:]]
    assert abs(sum(vals) - 1.0) < 1e-9  # normalized metric


def test_classify_cli_matches_multiprocess_path(trained):
    workdir = trained
    """kpop-classify (fused device pipeline) must produce the same
    KPopSummary as the KPopCount|twistdb -k|twistdb -s chain."""
    k = 5
    sh(
        "cat clusters-small.fasta | "
        "awk '{nr=(NR-1)%%4; if (nr==2) split($0,s,\"[>-]\"); if (nr==3) print \">\"s[2]\"-\"s[3]\"\\n\"$0}' "
        "> test_seqs.fasta && "
        "kpop-classify -T Classes.%d -t Classes.%d -f test_seqs.fasta -o Fused"
        % (k, k),
        workdir,
    )
    fused = sorted((workdir / "Fused.KPopSummary.txt").read_text().splitlines())
    ref = sorted(
        (workdir / ("Test_prediction.%d.KPopSummary.txt" % k))
        .read_text()
        .splitlines()
    )
    assert len(fused) == len(ref) == 100
    # float32 device distances vs float64 host: compare fields numerically
    for lf, lr in zip(fused, ref):
        pf, pr = lf.split("\t"), lr.split("\t")
        assert pf[0] == pr[0]
        assert pf[5] == pr[5], f"class mismatch: {pf[0]}: {pf[5]} != {pr[5]}"
        for a, b in zip(pf[1:5], pr[1:5]):
            assert abs(float(a) - float(b)) < 1e-4 * max(1.0, abs(float(b)))
