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
    with open(shard_path, "wb") as f:
        framed.write_header(f, TAG, {"process": pi})
        seen = set()  # replicated axes repeat the same index: write once
        for s in sorted(arr.addressable_shards, key=lambda s: str(s.index)):
            start = tuple(sl.start or 0 for sl in s.index)
            if start in seen:
                continue
            seen.add(start)
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
        # re-saving the same prefix from FEWER processes must not leave
        # stale higher-index shard files: their frames would double-cover
        # (and could overwrite) the loader's target shards
        stale = jax.process_count()
        while os.path.exists(path_prefix + f".shard{stale}.kpopckpt"):
            os.remove(path_prefix + f".shard{stale}.kpopckpt")
            stale += 1


def load_sharded(
    path_prefix: str, mesh: Mesh, spec: P
) -> "jax.Array":
    """Reassemble a sharded array onto ``mesh`` with partition ``spec``,
    reading ONLY the bytes each addressable target shard needs.

    The reference contract is that register dumps are reloadable at any
    scale (lib/KMerDB.ml:389-430); the earlier implementation materialized
    ``np.zeros(full_shape)`` on every host, which a flagship-scale twister
    cannot afford.  Here each target shard is assembled from the
    intersecting saved frames via ``np.memmap`` (only intersecting pages
    are faulted in) and placed with
    ``jax.make_array_from_single_device_arrays``; host RSS is bounded by
    the largest addressable shard, not the global array.  The saved and
    target partitionings need not match (e.g. save from 8 devices, load
    onto 4)."""
    with open(path_prefix + ".kpopckpt", "rb") as f:
        meta = framed.read_header(f, expect_tag=TAG + "Meta")
    shape = tuple(meta["shape"])
    dtype = np.dtype(meta["dtype"])
    sharding = NamedSharding(mesh, spec)

    # index pass: (path, data_offset, saved dtype, start coords, frame shape)
    # — exactly the shard files the metadata says the save wrote; a stale
    # shard file from an earlier larger-process save must not be indexed
    # (its frames could double-cover or overwrite target shards)
    index = []
    seen = set()  # replicated shards may repeat within or across files
    for p in range(int(meta.get("processes", 1))):
        shard_path = path_prefix + f".shard{p}.kpopckpt"
        if not os.path.exists(shard_path):
            raise FileNotFoundError(
                f"checkpoint {path_prefix!r}: metadata says "
                f"{meta.get('processes')} shard files but "
                f"{shard_path!r} is missing"
            )
        with open(shard_path, "rb") as f:
            framed.read_header(f, expect_tag=TAG)
            for name, fdt, fshape, off in framed.iter_frames_meta(f):
                if name.startswith("shard:") and (name, fshape) not in seen:
                    seen.add((name, fshape))
                    start = tuple(
                        int(x) for x in name[len("shard:"):].split(",")
                    )
                    index.append((shard_path, off, fdt, start, fshape))
    if not index:
        raise FileNotFoundError(
            f"no shard files found for checkpoint {path_prefix!r}"
        )

    def _concrete(idx) -> tuple:
        return tuple(
            (sl.start or 0, shape[i] if sl.stop is None else sl.stop)
            for i, sl in enumerate(idx)
        )

    buf_cache: dict = {}  # target index -> host buffer (partial replication)

    def _assemble(bounds) -> np.ndarray:
        if bounds in buf_cache:
            return buf_cache[bounds]
        tgt_shape = tuple(hi - lo for lo, hi in bounds)
        buf = np.empty(tgt_shape, dtype=dtype)
        covered = 0
        for path, off, fdt, start, fshape in index:
            inter = []
            for (lo, hi), st, sz in zip(bounds, start, fshape):
                a, b = max(lo, st), min(hi, st + sz)
                if a >= b:
                    inter = None
                    break
                inter.append((a, b, st, lo))
            if inter is None:
                continue
            frame = np.memmap(path, dtype=fdt, mode="r", offset=off,
                              shape=fshape)
            src = tuple(slice(a - st, b - st) for a, b, st, _ in inter)
            dst = tuple(slice(a - lo, b - lo) for a, b, _, lo in inter)
            buf[dst] = frame[src]
            del frame
            covered += int(np.prod([b - a for a, b, _, _ in inter]))
        if covered != buf.size:
            raise framed.IncompatibleArchive(
                f"checkpoint {path_prefix!r} covers {covered} of "
                f"{buf.size} elements of target shard {bounds} "
                f"(missing shard files?)"
            )
        from .mesh import device_canonical

        buf = device_canonical(buf)
        buf_cache[bounds] = buf
        return buf

    dev_map = sharding.addressable_devices_indices_map(shape)
    arrays = [
        jax.device_put(_assemble(_concrete(idx)), dev)
        for dev, idx in dev_map.items()
    ]
    return jax.make_array_from_single_device_arrays(shape, sharding, arrays)
