"""Mesh-scaling regression: the sharded CA and the kmer-sharded serving
must not slow down pathologically as the mesh grows (the collective payload
is O(B x d), independent of the sharded axis).  The committed full curve is
BENCH_SCALING.json (benchmarks/scaling.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(n_dev: int) -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO
    env["KPOP_SCALING_SCALE"] = "0.5"
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "benchmarks", "scaling.py"),
            "--child",
            str(n_dev),
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    line = next(
        l for l in res.stdout.splitlines() if l.startswith("{")
    )
    return json.loads(line)


def _best_of(n_dev: int, runs: int = 3) -> dict:
    """Min over repeated child runs: wall times on a shared CI host are
    contention-noisy; the minimum is the stable contention-free estimate."""
    results = [_run_child(n_dev) for _ in range(runs)]
    best = dict(results[0])
    for r in results[1:]:
        for key in ("ca_warm_s", "serving_warm_s_per_batch"):
            best[key] = min(best[key], r[key])
    return best


def test_no_pathological_slowdown_at_8_devices():
    one = _best_of(1)
    eight = _best_of(8)
    assert eight["mesh"] == {"data": 4, "kmer": 2}
    # 8 virtual devices share the host's physical cores (2 in this
    # environment), so thread contention makes some slowdown inherent —
    # what this gates is that the kmer-sharded serving and sharded-CA
    # overhead stays BOUNDED (the collective payload is O(B x d)): the
    # measured min-of-3 is ~1.2x (CA) / ~1.5x (serving) on 2 cores, and a
    # pathological collective/dispatch regression would blow well past
    # these margins.  The claim scoping lives in BASELINE.md.
    assert eight["ca_warm_s"] <= 1.4 * one["ca_warm_s"], (one, eight)
    assert (
        eight["serving_warm_s_per_batch"]
        <= 1.8 * one["serving_warm_s_per_batch"]
    ), (one, eight)
