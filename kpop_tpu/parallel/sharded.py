"""Sharded multi-chip compute paths: CA training, projection, distances.

These are the multi-device versions of the pipeline kernels, with explicit
``NamedSharding`` layouts over the (data, kmer) mesh; XLA inserts the
collectives:

- :func:`ca_fit_sharded`     — CA over a k-mer-sharded table: local Gram
  contributions are psum-reduced to a tiny replicated [ns, ns] matrix which
  is eigendecomposed on every device; the twister stays k-mer-sharded.
- :func:`project_sharded`    — [B, K] x [K, d] contraction with B sharded
  over "data" and K over "kmer" (psum over "kmer").
- :func:`pairwise_sharded`   — query rows sharded over the whole mesh,
  targets replicated.

This replaces the reference's manual multi-node scatter + ``-a`` file merges
(README.md:1049-1067) with one SPMD program.
"""

from __future__ import annotations

import numpy as np

from ..config import jax_setup

jax = jax_setup()
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from .mesh import (  # noqa: E402
    DATA_AXIS,
    KMER_AXIS,
    device_canonical,
    pad_to_multiple,
)


def _host(arr) -> np.ndarray:
    """Fetch a jax.Array to host, gathering across processes when its shards
    are not all addressable (multi-host runs)."""
    if arr.is_fully_replicated or arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


# ---------------- CA ----------------


def _gram_compensated(S, n_blocks: int = 32):
    """S^T S with blocked Kahan-compensated accumulation: recovers most of
    the float64 accuracy lost to long f32 summation chains over the k-mer
    axis without paying TPU-emulated f64 matmuls."""
    K = S.shape[0]
    blk = max(1, K // n_blocks)
    pad = (-K) % blk
    Sp = jnp.pad(S, ((0, pad), (0, 0)))
    blocks = Sp.reshape(-1, blk, S.shape[1])

    def body(carry, b):
        acc, comp = carry
        g = jnp.dot(b.T, b, preferred_element_type=S.dtype)
        y = g - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    ns = S.shape[1]
    init = (jnp.zeros((ns, ns), S.dtype), jnp.zeros((ns, ns), S.dtype))
    (acc, _), _ = jax.lax.scan(body, init, blocks)
    return acc


def _ca_math(table, n_dims: int, compensated: bool = True):
    """The CA factorization on a (possibly sharded) [K, ns] table.

    Pure jnp; sharding of ``table`` along axis 0 makes XLA compute the
    column sums and the Gram matrix with psums over the kmer axis.
    """
    total = table.sum()
    P_ = table / total
    r = P_.sum(axis=1)  # [K] sharded
    c = P_.sum(axis=0)  # [ns] replicated (psum over kmer shards)
    r_safe = jnp.where(r > 0, r, 1.0)
    c_safe = jnp.where(c > 0, c, 1.0)
    S = (P_ - r[:, None] * c[None, :]) / jnp.sqrt(
        r_safe[:, None] * c_safe[None, :]
    )
    if compensated:
        G = _gram_compensated(S)  # [ns, ns] replicated
    else:
        G = jnp.dot(S.T, S, preferred_element_type=S.dtype)
    evals, evecs = jnp.linalg.eigh(G)  # ascending
    evals = evals[::-1][:n_dims]
    V = evecs[:, ::-1][:, :n_dims]
    evals = jnp.maximum(evals, 0.0)
    sv = jnp.sqrt(evals)
    # deterministic sign: largest-|.| component of each column positive
    amax = jnp.argmax(jnp.abs(V), axis=0)
    signs = jnp.sign(V[amax, jnp.arange(n_dims)])
    signs = jnp.where(signs == 0, 1.0, signs)
    V = V * signs[None, :]
    sample_coords = V * sv[None, :] / jnp.sqrt(c_safe)[:, None]
    sv_safe = jnp.where(sv > 0, sv, 1.0)
    phi = (
        jnp.dot(S, V / sv_safe[None, :], preferred_element_type=S.dtype)
        / jnp.sqrt(r_safe)[:, None]
    )
    phi = jnp.where((r > 0)[:, None], phi, 0.0)
    total_in = evals.sum()
    inertia = jnp.where(total_in > 0, evals / total_in, evals)
    return sample_coords, inertia, phi, sv  # phi [K, d] sharded over kmer


def ca_fit_sharded(mesh: Mesh, table: np.ndarray, n_dims: int | None = None):
    """Fit CA with the k-mer axis sharded across the whole mesh.

    ``table``: host [n_kmers, n_samples].  Returns host arrays
    (sample_coords, inertia, twister [d, K], sv).
    """
    nk, ns = table.shape
    d = min(nk, ns) - 1 if n_dims is None else n_dims
    n_shards = mesh.devices.size
    padded, orig = pad_to_multiple(device_canonical(table), 0, n_shards)
    x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    xs = jax.device_put(padded, x_sharding)
    fn = jax.jit(
        lambda t: _ca_math(t, d),
        out_shardings=(
            NamedSharding(mesh, P(None, None)),
            NamedSharding(mesh, P(None)),
            x_sharding,
            NamedSharding(mesh, P(None)),
        ),
    )
    coords, inertia, phi, sv = fn(xs)
    return (
        _host(coords),
        _host(inertia),
        _host(phi)[:orig].T,
        _host(sv),
    )


# ---------------- projection ----------------


def project_sharded(
    mesh: Mesh,
    spectra: np.ndarray,
    twister_t: np.ndarray,
    normalize: bool = True,
):
    """[B, K] spectra x [K, d] twister^T with B over "data", K over "kmer"."""
    n_data = mesh.shape[DATA_AXIS]
    n_kmer = mesh.shape[KMER_AXIS]
    xs, B = pad_to_multiple(device_canonical(spectra), 0, n_data)
    xs, K = pad_to_multiple(xs, 1, n_kmer)
    tw, _ = pad_to_multiple(device_canonical(twister_t), 0, n_kmer)
    x_sh = NamedSharding(mesh, P(DATA_AXIS, KMER_AXIS))
    w_sh = NamedSharding(mesh, P(KMER_AXIS, None))
    xs = jax.device_put(xs, x_sh)
    tw = jax.device_put(tw, w_sh)

    def fn(x, w):
        if normalize:
            sums = x.sum(axis=1, keepdims=True)  # psum over kmer shards
            x = x / jnp.where(sums == 0.0, 1.0, sums)
        return jnp.dot(x, w, preferred_element_type=x.dtype)

    out = jax.jit(
        fn, out_shardings=NamedSharding(mesh, P(DATA_AXIS, None))
    )(xs, tw)
    return _host(out)[:B]


# ---------------- pairwise distances ----------------


def pairwise_sharded(
    mesh: Mesh,
    queries: np.ndarray,
    targets: np.ndarray,
    metric: np.ndarray,
    normalize: bool = True,
):
    """Metric-weighted euclidean distances [B, T]: queries sharded over the
    whole mesh (both axes), targets replicated — the layout for the
    classification workload where T (classes) << B (sequences)."""
    n_shards = mesh.devices.size
    q, B = pad_to_multiple(device_canonical(queries), 0, n_shards)
    q_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    rep = NamedSharding(mesh, P(None, None))
    qd = jax.device_put(q, q_sh)
    td = jax.device_put(device_canonical(targets), rep)
    md = jax.device_put(device_canonical(metric), NamedSharding(mesh, P(None)))

    def fn(a, b, m):
        if normalize:
            na = jnp.sqrt((a * a * m[None, :]).sum(axis=1))
            na = jnp.where(na == 0.0, 1.0, na)
            a = a / na[:, None]
            nb = jnp.sqrt((b * b * m[None, :]).sum(axis=1))
            nb = jnp.where(nb == 0.0, 1.0, nb)
            b = b / nb[:, None]
        am = a * m[None, :]
        cross = jnp.dot(am, b.T, preferred_element_type=a.dtype)
        na2 = (am * a).sum(axis=1)
        nb2 = (b * b * m[None, :]).sum(axis=1)
        d2 = jnp.maximum(na2[:, None] + nb2[None, :] - 2.0 * cross, 0.0)
        return jnp.sqrt(d2)

    out = jax.jit(fn, out_shardings=q_sh)(qd, td, md)
    return _host(out)[:B]
