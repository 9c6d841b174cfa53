"""Input pipeline sharding and sharded checkpoints (virtual CPU mesh)."""

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
