"""Pallas TPU kernel: tiled metric-weighted euclidean distance blocks.

The hot op of the relatedness engine (all-pairs distances over 10^5+
samples, reference README.md §5.2) and of classification.  One kernel
invocation computes a ``[TQ, TT]`` tile of

    d[q, t] = sqrt( sum_j m_j (a[q,j]/na_q - b[t,j]/nb_t)^2 )

with the cross term on the MXU (``pl.dot``) and the norm terms fused on the
VPU — one HBM pass per operand tile instead of XLA's multiple
materializations of the expansion.  Falls back to interpret mode off-TPU
(used by the CPU tests).
"""

from __future__ import annotations

import functools

import numpy as np

from ..config import jax_setup

jax = jax_setup()
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

# Tuned on TPU v5e (see docs/PALLAS.md): at [4096, 4096, 512] the
# (256, 2048) tiling runs the fused tile in 0.93 ms vs 1.15 ms for the XLA
# matmul expansion (1.23x).  Small operands drop to one right-sized tile.
# The feature axis is blocked too (third grid dimension, partial-sum
# accumulation into the out tile): the raw-spectrum workload has D = the
# k-mer vocabulary (10^5-10^6), far beyond the ~16 MB of VMEM if a full
# (tile, D) slab were resident.
TILE_Q = 256
TILE_T = 2048
TILE_D = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dist_kernel(a_ref, b_ref, m_ref, na_ref, nb_ref, out_ref):
    # a: [TQ, TD], b: [TT, TD], m: [1, TD], na: [TQ, 1], nb: [TT, 1];
    # grid dim 2 walks the feature axis: each step accumulates its partial
    # |a-b|^2 expansion into the (revisited) out tile; sqrt on the last step.
    kd = pl.program_id(2)

    @pl.when(kd == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    a = a_ref[:] / na_ref[:]
    b = b_ref[:] / nb_ref[:]
    m = m_ref[:]
    am = a * m
    cross = jax.lax.dot_general(
        am, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    na2 = (am * a).sum(axis=1, keepdims=True)  # [TQ, 1]
    nb2 = (b * m * b).sum(axis=1, keepdims=True)  # [TT, 1]
    out_ref[:] += na2 + nb2.T - 2.0 * cross

    @pl.when(kd == pl.num_programs(2) - 1)
    def _finish():
        out_ref[:] = jnp.sqrt(jnp.maximum(out_ref[:], 0.0))


def _pad(x, axis, mult, value=0.0):
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("normalize", "interpret"))
def pairwise_distances_pallas(
    queries, targets, metric, normalize: bool = True, interpret: bool = False
):
    """``[Q, D] x [T, D] -> [Q, T]`` metric-weighted euclidean distances.

    Row-norm normalization (lib/Matrix.ml:191-266 semantics: zero norms
    replaced by 1) is fused via per-row scale vectors.
    """
    Q, D = queries.shape
    T, _ = targets.shape
    m = metric.astype(jnp.float32)
    a = queries.astype(jnp.float32)
    b = targets.astype(jnp.float32)
    if normalize:
        na = jnp.sqrt((a * a * m[None, :]).sum(axis=1))
        na = jnp.where(na == 0.0, 1.0, na)
        nb = jnp.sqrt((b * b * m[None, :]).sum(axis=1))
        nb = jnp.where(nb == 0.0, 1.0, nb)
    else:
        na = jnp.ones((Q,), jnp.float32)
        nb = jnp.ones((T,), jnp.float32)
    # adaptive tiles: full-size for large operands, one right-sized tile for
    # small ones (a 10-class target set must not pad to 2048 rows); the
    # feature axis blocks at TILE_D (zero-padded features contribute 0)
    tile_q = TILE_Q if Q >= TILE_Q else _round_up(Q, 8)
    tile_t = TILE_T if T > TILE_T // 2 else _round_up(T, 128)
    tile_d = TILE_D if D > TILE_D else _round_up(D, 128)
    a = _pad(_pad(a, 0, tile_q), 1, tile_d)
    b = _pad(_pad(b, 0, tile_t), 1, tile_d)
    m2 = _pad(m[None, :], 1, tile_d)
    na = _pad(na[:, None], 0, tile_q, value=1.0)
    nb = _pad(nb[:, None], 0, tile_t, value=1.0)
    Qp, Dp = a.shape
    Tp, _ = b.shape
    grid = (Qp // tile_q, Tp // tile_t, Dp // tile_d)
    out = pl.pallas_call(
        _dist_kernel,
        out_shape=jax.ShapeDtypeStruct((Qp, Tp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, tile_d), lambda i, j, kd: (i, kd)),
            pl.BlockSpec((tile_t, tile_d), lambda i, j, kd: (j, kd)),
            pl.BlockSpec((1, tile_d), lambda i, j, kd: (0, kd)),
            pl.BlockSpec((tile_q, 1), lambda i, j, kd: (i, 0)),
            pl.BlockSpec((tile_t, 1), lambda i, j, kd: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_t), lambda i, j, kd: (i, j)),
        interpret=interpret,
    )(a, b, m2, na, nb)
    return out[:Q, :T]
