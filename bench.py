#!/usr/bin/env python3
"""Headline benchmark: spectra/s/chip for the fused count + twist-project +
classify pipeline on genome-length sequences.

Workload modeled on the reference's SARS-CoV-2 classification run
(BASELINE.md: ~650K sequences in ~14h on one CPU node ~= 13 seq/s, k=10,
~1636 classes): 30 kb DNA sequences, k=10, a 256K-k-mer twister with 512
dimensions, 512 classes.  Each timed iteration includes host int8 encoding,
host->device transfer, window hashing, dense spectrum scatter, vocabulary
gather, normalization, MXU projection and metric-weighted nearest-class
classification.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference's ~13 seq/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SEQS_PER_S = 13.0  # reference README.md:1049 (~650K seqs / 14 h)


def main() -> None:
    from kpop_tpu.config import jax_setup

    jax = jax_setup()
    import jax.numpy as jnp

    from kpop_tpu.ops.pipeline import (
        ClassifierParams,
        count_spectra,
        distances_to_classes,
        project,
        summarize_batch,
    )

    k = 10
    n_codes = 4**k
    V = 262_144  # twister vocabulary (observed k-mers)
    d = 512  # twisted dimensions
    C = 512  # classes
    B = 128  # sequences per batch
    L = 30_000  # SARS-CoV-2-scale genome length
    n_batches = int(os.environ.get("KPOP_BENCH_BATCHES", "12"))

    rng = np.random.default_rng(0)
    lut = np.full(n_codes + 1, V, dtype=np.int32)
    vocab_codes = rng.choice(n_codes, size=V, replace=False)
    lut[vocab_codes] = np.arange(V, dtype=np.int32)
    params = ClassifierParams(
        vocab_lut=jnp.asarray(lut),
        twister=jnp.asarray(
            rng.standard_normal((V, d)).astype(np.float32) * 0.01
        ),
        metric=jnp.asarray((lambda m: m / m.sum())(rng.random(d).astype(np.float32))),
        class_coords=jnp.asarray(rng.standard_normal((C, d)).astype(np.float32)),
        class_norms=jnp.asarray(np.ones(C, dtype=np.float32)),
        k=k,
        canonical=True,
    )

    # pre-generate an in-memory FASTA payload (one batch worth); timed
    # iterations parse + lint + encode it like real input files
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    payload = b"".join(
        b">seq%d\n%s\n" % (i, bases[rng.integers(0, 4, size=L)].tobytes())
        for i in range(B)
    )

    from kpop_tpu import native

    use_native = native.available()
    base_map = np.full(256, -1, dtype=np.int8)
    for i, ch in enumerate(b"ACGT"):
        base_map[ch] = i

    def host_encode() -> np.ndarray:
        if use_native:
            codes, _names, _lens, _consumed = native.fasta_encode_batch(
                payload, B, L
            )
            return codes
        out = np.empty((B, L), dtype=np.int8)
        pos = 0
        raw = np.frombuffer(payload, dtype=np.uint8)
        for i in range(B):
            pos = payload.index(b"\n", pos) + 1
            out[i] = base_map[raw[pos : pos + L]]
            pos += L + 1
        return out

    from kpop_tpu.ops.encode import unpack_2bit_batch

    def _step_impl(p, base_codes):
        spectra = count_spectra(p, base_codes)
        twisted = project(p, spectra)
        dmat = distances_to_classes(p, twisted)
        mean, std, med, mad, top, idx = summarize_batch(dmat, 2)
        return idx, top

    # only one program is compiled (remote compile services can be slow)
    if use_native:
        step_packed = jax.jit(
            lambda p, packed, valid: _step_impl(
                p, unpack_2bit_batch(packed, valid, L)
            )
        )
    else:
        step = jax.jit(_step_impl)

    def encode_and_dispatch():
        """Host parse+encode, pack to the 2-bit wire format when the native
        library is present, upload, run the fused device step."""
        codes = host_encode()
        if use_native:
            packed, valid = native.pack_2bit_batch(codes)
            return step_packed(params, jnp.asarray(packed), jnp.asarray(valid))
        return step(params, jnp.asarray(codes))

    # warm up / compile (params travel as arguments, never as constants)
    t_warm = time.perf_counter()
    _ = jax.device_get(encode_and_dispatch())  # forces real completion
    # (block_until_ready can be unreliable over tunneled backends)
    sys.stderr.write(
        "bench: warmup (compile+first batch) %.1fs\n"
        % (time.perf_counter() - t_warm)
    )

    def timed_pass() -> float:
        t0 = time.perf_counter()
        outs = [encode_and_dispatch() for _ in range(n_batches)]
        # fetch every batch's predictions (tiny [B, 2] arrays) — the real
        # serving output — which forces all queued compute to finish
        preds = jax.device_get(outs)
        dt = time.perf_counter() - t0
        assert len(preds) == n_batches and preds[-1][0].shape == (B, 2)
        return dt

    # two passes; report the steadier (faster) one — transfer times through
    # tunneled dev backends vary with contention.  Skip the second pass when
    # the first was already slow (keeps worst-case wall time bounded).
    dt = timed_pass()
    if dt < 60.0:
        dt = min(dt, timed_pass())

    seqs_per_s = n_batches * B / dt
    print(
        json.dumps(
            {
                "metric": "count+twist-project+classify throughput (30kb seqs, k=10, 256K-kmer twister, 512 dims/classes)",
                "value": round(seqs_per_s, 1),
                "unit": "spectra/s/chip",
                "vs_baseline": round(seqs_per_s / BASELINE_SEQS_PER_S, 1),
            }
        )
    )


def _supervise() -> int:
    """Run the benchmark in a watchdogged subprocess: the dev TPU tunnel's
    compile service sometimes stalls for many minutes, and a hung XLA
    compile cannot be interrupted in-process.  Falls back to a (labelled)
    CPU measurement so a result is always produced."""
    import subprocess

    here = os.path.abspath(__file__)
    attempts = [
        (480, {}),
        (300, {}),
        (600, {"KPOP_PLATFORM": "cpu", "KPOP_BENCH_BATCHES": "2"}),
    ]
    for timeout_s, extra_env in attempts:
        env = dict(os.environ, KPOP_BENCH_CHILD="1", **extra_env)
        try:
            res = subprocess.run(
                [sys.executable, here],
                env=env,
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f"bench attempt timed out after {timeout_s}s "
                f"(env={extra_env}); retrying\n"
            )
            continue
        line = next(
            (l for l in res.stdout.splitlines() if l.startswith("{")), None
        )
        if res.returncode == 0 and line:
            data = json.loads(line)
            if extra_env.get("KPOP_PLATFORM") == "cpu":
                data["unit"] += " (cpu fallback: TPU tunnel stalled)"
            print(json.dumps(data))
            return 0
        sys.stderr.write(
            f"bench attempt failed rc={res.returncode}: "
            f"{res.stderr[-500:]}\n"
        )
    return 1


if __name__ == "__main__":
    if os.environ.get("KPOP_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise())
