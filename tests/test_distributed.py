"""True multi-process distributed execution test (SURVEY.md §2.5/P3).

Spawns a 2-process jax.distributed CPU job (coordinator + worker, 4 virtual
devices each = 8 global) and verifies, inside the workers:

- ``shard_files_for_process`` round-robin split,
- per-process FASTA encode + ``global_batch`` assembly into one global
  mesh-sharded array (content checksum vs a host pass over all files),
- ``save_sharded`` / ``load_sharded`` across per-process shard files,
- ``ca_fit_sharded`` parity with the host float64 CA,
- kmer-sharded serving (``parallel/serving.py``): twister rows partitioned
  across BOTH processes' devices, cross-process projection psum, parity
  with a host numpy re-computation.

This is the replacement's actual correctness test for the reference's
manual multi-node scatter + ``-a`` merge workflow (README.md:1049-1067);
everything else in the suite runs single-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_fastas(td) -> None:
    rng = np.random.default_rng(9)
    for i in range(4):
        with open(os.path.join(td, f"in{i}.fasta"), "w") as f:
            for j in range(4):
                seq = "".join(rng.choice(list("ACGT"), size=12))
                f.write(f">f{i}r{j}\n{seq}\n")


def _run_job(tmp_path, n_procs: int, local_dev: int) -> None:
    td = str(tmp_path)
    _write_fastas(td)
    port = _free_port()
    env = dict(os.environ)
    # the workers set their own XLA flags; scrub the 8-device conftest flag
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), td,
             str(n_procs), str(local_dev)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert os.path.exists(os.path.join(td, f"ok.{pid}"))


def test_two_process_distributed(tmp_path):
    _run_job(tmp_path, n_procs=2, local_dev=4)


def test_four_process_distributed(tmp_path):
    """The reference P3 workflow shape (README.md:1049-1067) at 4 processes:
    input shards -> global batch -> sharded CA -> sharded checkpoint
    save/load -> cross-process kmer-sharded serving -> per-process twisted
    chunks merged with the real `kpop-twistdb -a` machinery, all parity-
    checked against the single-host float64 chain inside the workers."""
    _run_job(tmp_path, n_procs=4, local_dev=2)
