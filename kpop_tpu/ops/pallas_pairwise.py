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
TILE_Q = 256
TILE_T = 2048


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dist_kernel(a_ref, b_ref, m_ref, na_ref, nb_ref, out_ref):
    # a: [TQ, D], b: [TT, D], m: [1, D], na: [TQ, 1], nb: [TT, 1]
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
    d2 = na2 + nb2.T - 2.0 * cross
    out_ref[:] = jnp.sqrt(jnp.maximum(d2, 0.0))


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
    # small ones (a 10-class target set must not pad to 2048 rows)
    tile_q = TILE_Q if Q >= TILE_Q else _round_up(Q, 8)
    tile_t = TILE_T if T > TILE_T // 2 else _round_up(T, 128)
    # pad to tile multiples (D to the 128-lane boundary)
    a = _pad(_pad(a, 0, tile_q), 1, 128)
    b = _pad(_pad(b, 0, tile_t), 1, 128)
    m2 = _pad(m[None, :], 1, 128)
    na = _pad(na[:, None], 0, tile_q, value=1.0)
    nb = _pad(nb[:, None], 0, tile_t, value=1.0)
    Qp, Dp = a.shape
    Tp, _ = b.shape
    grid = (Qp // tile_q, Tp // tile_t)
    out = pl.pallas_call(
        _dist_kernel,
        out_shape=jax.ShapeDtypeStruct((Qp, Tp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, Dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_t, Dp), lambda i, j: (j, 0)),
            pl.BlockSpec((1, Dp), lambda i, j: (0, 0)),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_t, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_t), lambda i, j: (i, j)),
        interpret=interpret,
    )(a, b, m2, na, nb)
    return out[:Q, :T]
