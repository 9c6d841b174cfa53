"""Checkpointing of sharded arrays.

The reference's binary register dumps *are* its checkpoints — every
intermediate can be saved and reloaded with magic+version validation
(SURVEY.md §5; lib/KMerDB.ml:389-430).  kpop-tpu keeps those file contracts
(kpop_tpu/io/framed.py) and adds a sharded variant for arrays too large for
one host write: each shard of a mesh-sharded ``jax.Array`` is written as its
own frame, addressable by shard index, so multi-host jobs write/read in
parallel (each process handles its addressable shards) and single-host jobs
round-trip transparently.
"""

from __future__ import annotations

import os
import numpy as np

from ..config import jax_setup

jax = jax_setup()
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from ..io import framed  # noqa: E402

TAG = "KPopShardedArray"


def save_sharded(path_prefix: str, arr: "jax.Array") -> None:
    """Write the addressable shards of ``arr``; one file per process:
    ``<prefix>.shard<process_index>.kpopckpt`` plus a metadata file written
    by process 0."""
    pi = jax.process_index()
    meta_path = path_prefix + ".kpopckpt"
    shard_path = path_prefix + f".shard{pi}.kpopckpt"
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    with open(shard_path, "wb") as f:
        framed.write_header(f, TAG, {"process": pi})
        for s in shards:
            start = [sl.start or 0 for sl in s.index]
            framed.write_array(
                f, "shard:" + ",".join(map(str, start)), np.asarray(s.data)
            )
        framed.write_terminator(f)
    if pi == 0:
        with open(meta_path, "wb") as f:
            framed.write_header(
                f,
                TAG + "Meta",
                {
                    "shape": list(arr.shape),
                    "dtype": np.dtype(arr.dtype).str,
                    "processes": jax.process_count(),
                },
            )
            framed.write_terminator(f)


def load_sharded(
    path_prefix: str, mesh: Mesh, spec: P
) -> "jax.Array":
    """Reassemble a sharded array onto ``mesh`` with partition ``spec``.

    Single-controller implementation: reads every shard file it can see and
    places shards on the target sharding (sufficient for single-host and
    for multi-host runs over a shared filesystem)."""
    with open(path_prefix + ".kpopckpt", "rb") as f:
        meta = framed.read_header(f, expect_tag=TAG + "Meta")
    shape = tuple(meta["shape"])
    dtype = np.dtype(meta["dtype"])
    full = np.zeros(shape, dtype=dtype)
    p = 0
    while True:
        shard_path = path_prefix + f".shard{p}.kpopckpt"
        if not os.path.exists(shard_path):
            break
        with open(shard_path, "rb") as f:
            framed.read_header(f, expect_tag=TAG)
            frames = framed.read_frames(f)
        for name, data in frames.items():
            if not name.startswith("shard:"):
                continue
            start = [int(x) for x in name[len("shard:"):].split(",")]
            slices = tuple(
                slice(st, st + sz) for st, sz in zip(start, data.shape)
            )
            full[slices] = data
        p += 1
    from .mesh import device_canonical

    return jax.device_put(device_canonical(full), NamedSharding(mesh, spec))
