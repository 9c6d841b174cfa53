"""Device-side k-mer window encoding.

JAX re-expression of the host reference :meth:`KmerSpace.window_codes`
(kpop_tpu/core/kmers.py) for batches of sequences: the hot loop of the
reference's ``KIH.iterc`` (bin/KPopCount.ml:38) becomes k shifted
vectorized adds on the VPU, fused by XLA with the downstream scatter.

Sequences are pre-encoded host-side to int8 base codes (A=0 C=1 G=2 T=3,
-1 = window break / padding) and batched into ``[B, L]`` arrays.

Only k <= 15 runs on device (codes fit int32: 4^15 = 2^30); larger k uses
the host path, matching config.DENSE_K_MAX anyway.
"""

from __future__ import annotations

import numpy as np

from ..config import jax_setup

jax = jax_setup()
import jax.numpy as jnp  # noqa: E402

DEVICE_K_MAX = 15


def device_k_max(base: int) -> int:
    """Largest k whose codes fit int32 for the given alphabet size."""
    k = 0
    while base ** (k + 1) < 2**31:
        k += 1
    return k


def window_codes_batch(
    codes: "jnp.ndarray", k: int, canonical: bool, base: int = 4
):
    """``[B, L]`` int8/int32 base codes -> (window codes ``[B, L-k+1]`` int32,
    valid mask ``[B, L-k+1]`` bool).

    For canonical (DNA double-stranded) encoding the returned code is
    ``min(forward, revcomp)`` exactly as in the host reference.  ``base``
    is 4 for DNA and 20 for protein (canonical is DNA-only).
    """
    if k > device_k_max(base):
        raise ValueError(
            f"device path supports k <= {device_k_max(base)} for base "
            f"{base}, got {k}"
        )
    if canonical and base != 4:
        raise ValueError("canonical encoding is DNA-only")
    c = codes.astype(jnp.int32)
    B, L = c.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"sequences shorter than k: L={L}, k={k}")
    fwd = jnp.zeros((B, W), dtype=jnp.int32)
    ok = jnp.ones((B, W), dtype=jnp.bool_)
    mult = base ** (k - 1)
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, W, axis=1)
        fwd = fwd + jnp.maximum(cj, 0) * mult
        ok = ok & (cj >= 0)
        mult //= base
    if not canonical:
        return fwd, ok
    rc = jnp.zeros((B, W), dtype=jnp.int32)
    mult = 1
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, W, axis=1)
        rc = rc + jnp.maximum(3 - cj, 0) * mult
        mult *= base
    return jnp.minimum(fwd, rc), ok


def spectra_from_codes(
    window_codes: "jnp.ndarray",
    valid: "jnp.ndarray",
    n_kmers: int,
    dtype=jnp.float32,
):
    """Scatter-add window codes into per-sequence dense spectra ``[B, n_kmers]``.

    Invalid windows are routed to an extra trash bucket and dropped.  This
    replaces the reference's bounded hash table (``KMers.IntHashFrequencies``)
    with the dense representation the TPU pipeline consumes.
    """
    B, W = window_codes.shape
    tgt = jnp.where(valid, window_codes, n_kmers)
    out = jnp.zeros((B, n_kmers + 1), dtype=dtype)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 0)
    out = out.at[b_idx, tgt].add(jnp.ones((B, W), dtype=dtype))
    return out[:, :n_kmers]


def unpack_2bit_batch(packed, valid, length: int):
    """Device-side unpack of the 2-bit wire format produced by
    ``native.pack_2bit_batch``: returns [B, length] int32 base codes with
    -1 at invalid positions.  Pure shifts/masks — fuses into the window
    code computation."""
    B = packed.shape[0]
    # bases: byte i>>2, bits (i&3)*2
    idx = jnp.arange(length, dtype=jnp.int32)
    byte = packed[:, idx >> 2].astype(jnp.int32)
    base = (byte >> ((idx & 3) * 2)[None, :]) & 3
    vbyte = valid[:, idx >> 3].astype(jnp.int32)
    ok = (vbyte >> (idx & 7)[None, :]) & 1
    return jnp.where(ok == 1, base, -1)


def encode_reads_host(
    seqs: list[str], length: int | None = None
) -> np.ndarray:
    """Host helper: lint+encode sequences and pad to a common length with -1.

    Padding breaks windows at sequence ends automatically.
    """
    from ..core.kmers import encode_dna

    encoded = [encode_dna(s) for s in seqs]
    L = length or max((len(e) for e in encoded), default=0)
    out = np.full((len(encoded), L), -1, dtype=np.int8)
    for i, e in enumerate(encoded):
        out[i, : min(len(e), L)] = e[:L]
    return out
