#!/usr/bin/env python3
"""Flagship-envelope record: stream-fit CA on the FULL k=12 vocabulary.

The reference's biggest workload is a k=12 classifier DB of ~16.7M k-mers
x ~1,000 samples (/root/reference/README.md:530,1023-1029), factored by R's
``ca()`` bounded only by host RAM (/root/reference/src/KPopTwist:95-96).
One v5e chip has 16 GB HBM: the resident dd CA would need ~17 GB of wire
table plus a ~67 GB full-dim phi, so this drives the HBM-budgeted STREAMED
path (parallel/sharded.py::_ca_fit_streamed — upload -> Gram-accumulate ->
discard, second streamed phi pass) with ``n_dims`` leading dimensions and
``phi="device"``, then classifies a batch straight through the
device-resident ``[16.7M, n_dims]`` twister — train-to-serve at the
reference's flagship table shape on a single chip.

Counts are synthetic (uniform u8, ~25% density): this is a shape/wall/
residency record; value parity of the streamed path is covered by
tests/test_ca_streamed.py (including n_dims truncation) at CI scale.

Writes BENCH_FLAGSHIP.json at the repo root — a separate artifact from
BENCH_DETAILS.json, which the driver's bench run rewrites wholesale.

Env knobs: KPOP_FLAGSHIP_NK / _NS / _DIMS / _HBM (per-device CA budget,
bytes) / _B / _L; KPOP_PLATFORM=cpu shrinks every default for a smoke run.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("KPOP_CA_DEBUG", "1")  # per-phase walls on stderr

import numpy as np


class _Tee:
    """Forward stderr while capturing it (the KPOP_CA_DEBUG phase lines
    become the JSON record's phases_s)."""

    def __init__(self, inner):
        self.inner = inner
        self.chunks: list[str] = []

    def write(self, s):
        self.chunks.append(s)
        return self.inner.write(s)

    def flush(self):
        self.inner.flush()

    def captured(self) -> str:
        return "".join(self.chunks)


def main() -> None:
    from kpop_tpu.config import jax_setup

    jax = jax_setup()
    import jax.numpy as jnp

    from kpop_tpu.parallel import sharded
    from kpop_tpu.parallel.mesh import make_mesh

    on_tpu = jax.default_backend() == "tpu"
    env = os.environ.get
    NK = int(env("KPOP_FLAGSHIP_NK", str(4**12 if on_tpu else 1 << 16)))
    NS = int(env("KPOP_FLAGSHIP_NS", "1000" if on_tpu else "64"))
    DIMS = int(env("KPOP_FLAGSHIP_DIMS", "64" if on_tpu else "8"))
    # memory_stats() is unavailable over the dev tunnel, so the 60%-of-HBM
    # default cannot auto-derive: pass the v5e budget explicitly
    HBM = int(float(env("KPOP_FLAGSHIP_HBM",
                        str(int(16e9 * 0.6)) if on_tpu else str(1 << 18))))
    B = int(env("KPOP_FLAGSHIP_B", "16"))
    L = int(env("KPOP_FLAGSHIP_L", "30000"))

    def log(msg):
        sys.stderr.write("flagship[%7.1fs]: %s\n" % (time.perf_counter() - T0, msg))
        sys.stderr.flush()

    T0 = time.perf_counter()
    rng = np.random.default_rng(12)
    log("building %d x %d u8 table (%.1f GB host)" % (NK, NS, NK * NS / 2**30))
    table = np.empty((NK, NS), np.uint8)
    step = max(1, (256 << 20) // NS)
    for i in range(0, NK, step):
        blk = rng.integers(
            0, 256, size=(min(step, NK - i), NS), dtype=np.uint8
        )
        # keep bytes < 64 as counts (values 1..63, ~25% density), else zero
        table[i : i + blk.shape[0]] = np.where(blk < 64, blk, 0)
    gen_s = time.perf_counter() - T0
    log("table built in %.1f s" % gen_s)
    colsums = table.sum(axis=0, dtype=np.float64)
    col_w = 1.0 / np.where(colsums == 0.0, 1.0, colsums)

    mesh = make_mesh()
    tee = _Tee(sys.stderr)
    sys.stderr = tee
    try:
        t0 = time.perf_counter()
        coords, inertia, tw_dev, sv = sharded.ca_fit_sharded(
            mesh, table, n_dims=DIMS, col_weights=col_w,
            hbm_bytes=HBM, phi="device", verbose=True,
        )
        fit_s = time.perf_counter() - t0
    finally:
        sys.stderr = tee.inner
    stream = dict(sharded.LAST_CA_STREAM or {})
    assert stream, "flagship table unexpectedly took the resident path"
    import re

    phases = {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r"ca_fit_sharded\[(.+?)\]: ([\d.]+) s", tee.captured()
        )
    }
    log("fit done %.1f s (%s blocks of %s rows, wire=%s)"
        % (fit_s, stream.get("n_blocks"), stream.get("block_rows"),
           stream.get("wire")))

    # ---- serve straight from the device-resident twister ----
    # identity LUT: synthetic table row i IS k-mer code i, so every
    # canonical window code maps to its own twister row
    from kpop_tpu.core.space import Distance, normalizations
    from kpop_tpu.ops.pipeline import (
        ClassifierParams,
        count_spectra,
        distances_to_classes,
        project,
        summarize_batch,
    )

    # k from the vocabulary size: the identity LUT only covers the code
    # space when NK == 4^k (off-TPU smoke defaults to 4^8 = 65536)
    k_eff = round(np.log(NK) / np.log(4))
    assert 4**k_eff == NK, "KPOP_FLAGSHIP_NK must be a power of 4"
    lut = np.empty(NK + 1, dtype=np.int32)
    lut[:NK] = np.arange(NK, dtype=np.int32)
    lut[NK] = NK  # trash row
    metric = np.full(DIMS, 1.0 / DIMS)
    cls_norms = normalizations(
        Distance.of_string("euclidean"), metric, coords
    )
    params = ClassifierParams(
        vocab_lut=jnp.asarray(lut),
        twister=tw_dev,
        metric=jnp.asarray(metric, jnp.float32),
        class_coords=jnp.asarray(coords.astype(np.float32)),
        class_norms=jnp.asarray(cls_norms.astype(np.float32)),
        k=k_eff,
        canonical=True,
    )

    from kpop_tpu.ops.pipeline import project_reads

    def _step(p, base_codes):
        spectra = count_spectra(p, base_codes)
        twisted = project(p, spectra)
        dmat = distances_to_classes(p, twisted)
        _mean, _std, _med, _mad, top, idx = summarize_batch(dmat, 2)
        return idx, top

    def _step_bag(p, base_codes):
        # the --project-path bag route: no [B, V] spectrum, no full
        # twister read per batch — at this vocabulary it is the faster
        # serving layout AND avoids the scatter's minutes-long compile
        dmat = distances_to_classes(p, project_reads(p, base_codes))
        _mean, _std, _med, _mad, top, idx = summarize_batch(dmat, 2)
        return idx, top

    step_fn = jax.jit(_step)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    cd = jnp.asarray(codes)
    log("serving probe compile")
    t0 = time.perf_counter()
    first = jax.device_get(step_fn(params, cd))
    serve_compile_s = time.perf_counter() - t0
    n_iter = 10
    t0 = time.perf_counter()
    outs = [step_fn(params, cd) for _ in range(n_iter)]
    jax.device_get(outs[-1])
    serve_s = time.perf_counter() - t0
    rate = n_iter * B / serve_s
    assert np.asarray(first[0]).shape == (B, 2)
    log("serving %.1f seqs/s device-only at the full-vocab twister" % rate)
    bag_fn = jax.jit(_step_bag)
    B2 = 4 * B
    cd2 = jnp.asarray(rng.integers(0, 4, size=(B2, L)).astype(np.int8))
    t0 = time.perf_counter()
    first_bag = jax.device_get(bag_fn(params, cd2))
    bag_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [bag_fn(params, cd2) for _ in range(n_iter)]
    jax.device_get(outs[-1])
    bag_rate = n_iter * B2 / (time.perf_counter() - t0)
    assert np.asarray(first_bag[0]).shape == (B2, 2)
    log("serving (bag, B=%d) %.1f seqs/s device-only" % (B2, bag_rate))
    # prediction parity between the two projection routes (same [B, L]
    # shape as the compiled dense step, so no extra compile)
    dense_on_bag = jax.device_get(step_fn(params, cd2[:B]))
    bag_matches = float(
        (np.asarray(dense_on_bag[0])[:, 0]
         == np.asarray(first_bag[0])[:B, 0]).mean()
    )

    record = {
        "flagship_ca_streamed": {
            "table_shape": [NK, NS],
            "n_dims": DIMS,
            "table_gb_host_u8": round(NK * NS / 2**30, 2),
            "budget_bytes_per_device": HBM,
            "backend": jax.default_backend(),
            "table_gen_s": round(gen_s, 1),
            "wall_s_fit": round(fit_s, 3),
            "phases_s": phases,
            "stream": stream,
            "upload_gb_total": round(2 * NK * NS / 2**30, 2),
            "inertia_top8": [round(float(x), 6) for x in inertia[:8]],
            "inertia_kept_sum": round(float(inertia.sum()), 6),
            "note": "full k=12 vocabulary (4^12 rows) x %d samples through "
                    "the HBM-budgeted streamed CA on one chip "
                    "(upload->Gram-accumulate->discard + a second streamed "
                    "phi pass), n_dims=%d leading dims with phi='device' "
                    "(the full-dim [16.7M, %d] f32 twister would be ~%d GB "
                    "— beyond one chip by construction; multi-chip layouts: "
                    "parallel/serving.py).  Counts synthetic u8 ~25%% dense; "
                    "value parity of this path is tests/test_ca_streamed.py. "
                    "Reference envelope: README.md:530,1023-1029, CA bounded "
                    "only by host RAM (src/KPopTwist:95-96)."
                    % (NS, DIMS, NS - 1, NK * (NS - 1) * 4 >> 30),
        },
        "flagship_serving_from_device_twister": {
            "batch": B,
            "genome_len": L,
            "vocab_rows": NK,
            "dims": DIMS,
            "device_only_seqs_per_s": round(rate, 1),
            "compile_s": round(serve_compile_s, 1),
            "note": "count->project->classify jit fed DIRECTLY by the "
                    "device-resident streamed-CA twister (no download / "
                    "re-upload): the train-to-serve handoff at the flagship "
                    "vocabulary.  The bag variant is in "
                    "flagship_serving_paths.",
        },
        # keys match what docs/gen_bench_tables.py renders
        "flagship_serving_paths": {
            "vocab_rows": NK,
            "dims": DIMS,
            "genome_len": L,
            "dense_scatter_B%d_seqs_per_s" % B: round(rate, 1),
            "dense_scatter_compile_s": round(serve_compile_s, 1),
            "bag_B%d_seqs_per_s" % B2: round(bag_rate, 1),
            "bag_compile_s": round(bag_compile_s, 1),
            "bag_top1_matches_dense": bag_matches,
            "note": "same-session serving probe from the device-resident "
                    "twister: the embedding-bag gather path "
                    "(ops/pipeline.py::project_reads, kpop-classify "
                    "--project-path bag/auto) vs the dense [B, V] spectrum "
                    "scatter at the full k=12 vocabulary.  The bag path "
                    "never materializes the [B, V] spectrum, so at this "
                    "vocabulary it is faster and compiles in seconds "
                    "instead of the scatter's minutes; kpop-classify "
                    "--project-path auto picks by estimated traffic.",
        },
    }
    # off-TPU smoke runs must not clobber the committed chip record (it is
    # rendered into docs/BENCH_TABLES.md and drift-gated); MERGE into the
    # existing artifact so sections this run did not produce survive
    out_path = os.path.join(
        REPO,
        "BENCH_FLAGSHIP.json" if on_tpu else "BENCH_FLAGSHIP_SMOKE.json",
    )
    try:
        with open(out_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(record)
    tmp_path = out_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    os.replace(tmp_path, out_path)
    if on_tpu:
        import subprocess as _sp

        _sp.run(
            [sys.executable, os.path.join(REPO, "docs",
                                          "gen_bench_tables.py")],
            check=False, timeout=60,
        )
    print(json.dumps({"wall_s_fit": round(fit_s, 1),
                      "serving_seqs_per_s": round(rate, 1)}))
    log("wrote %s" % out_path)


if __name__ == "__main__":
    main()
