"""Count transformations and column/row statistics.

Exact re-implementations (vectorized) of the reference's
``KMerDB.Transformation`` (lib/KMerDB.ml:73-168) and
``stats_table_of_core_db`` (lib/KMerDB.ml:170-268).

All functions take the counts matrix as ``[n_rows(kmers), n_cols(samples)]``
float64 and are pure numpy; the JAX versions used inside fused TPU pipelines
live in :mod:`kpop_tpu.ops.transform_kernels` and are tested for agreement
against these.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EPSILON = 0.1  # CLR epsilon, lib/KMerDB.ml:96


class UnknownTransformation(ValueError):
    pass


class InvalidTransformation(ValueError):
    pass


@dataclass(frozen=True)
class Transformation:
    """Parameters: which ('binary'|'power'|'clr'|'pseudocounts'), threshold, power."""

    which: str = "power"
    threshold: float = 1.0
    power: float = 1.0

    def __post_init__(self):
        w = self.normalized_which
        if w not in ("binary", "power", "clr", "pseudocounts"):
            raise UnknownTransformation(self.which)

    @property
    def normalized_which(self) -> str:
        w = self.which
        if w == "pow":
            return "power"
        if w == "CLR":
            return "clr"
        if w == "pseudo":
            return "pseudocounts"
        return w


@dataclass
class StatsTable:
    """Per-column and per-row stats {non_zero, min, max, sum(v^p), sum_log}."""

    col_non_zero: np.ndarray
    col_min: np.ndarray
    col_max: np.ndarray
    col_sum: np.ndarray
    col_sum_log: np.ndarray
    row_non_zero: np.ndarray
    row_min: np.ndarray
    row_max: np.ndarray
    row_sum: np.ndarray
    row_sum_log: np.ndarray


def _axis_stats(counts: np.ndarray, threshold: float, power: float, axis: int):
    """Stats along one axis with the reference's threshold semantics
    (lib/KMerDB.ml:179-216): the fractional threshold is relative to the
    *powered* sum over all entries; stats then accumulate entries whose raw
    value is >= threshold.  Note the reference initializes ``min`` to 0 so it
    never exceeds 0 for non-negative counts; we reproduce that.
    """
    c = counts.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        powered = c if power == 1.0 else np.power(c, power)
        pre_sum = powered.sum(axis=axis)
        thr = np.where(threshold < 1.0, threshold * pre_sum, threshold)
        thr = np.expand_dims(thr, axis)
        mask = c >= thr
        non_zero = mask.sum(axis=axis)
        mn = np.minimum(np.where(mask, c, 0).min(axis=axis), 0)  # ref min starts at 0
        mx = np.where(mask, c, 0).max(axis=axis)
        s = np.where(mask, powered, 0.0).sum(axis=axis)
        logs = np.where(mask & (c > 0), np.log(np.where(c > 0, c, 1.0)) * power, 0.0)
        # the reference computes log of any passing value; counts==0 passes
        # only when threshold <= 0, in which case log 0 = -inf
        neg_inf = mask & (c == 0)
        sum_log = logs.sum(axis=axis)
        sum_log = np.where(neg_inf.any(axis=axis), -np.inf, sum_log)
    return non_zero, mn, mx, s, sum_log


def stats_table(counts: np.ndarray, transform: Transformation) -> StatsTable:
    """counts: [n_rows, n_cols] non-negative ints (as any numeric dtype)."""
    cn, cmin, cmax, cs, csl = _axis_stats(
        counts, transform.threshold, transform.power, axis=0
    )
    rn, rmin, rmax, rs, rsl = _axis_stats(
        counts, transform.threshold, transform.power, axis=1
    )
    return StatsTable(cn, cmin, cmax, cs, csl, rn, rmin, rmax, rs, rsl)


def apply_transform(
    counts: np.ndarray, transform: Transformation, stats: StatsTable | None = None
) -> np.ndarray:
    """Transform a ``[n_rows, n_cols]`` counts matrix elementwise.

    Vectorization of ``Transformation.compute`` (lib/KMerDB.ml:97-144); the
    per-element ``threshold`` is column-scaled when fractional.
    """
    if stats is None:
        stats = stats_table(counts, transform)
    c = counts.astype(np.float64)
    which = transform.normalized_which
    t, p = transform.threshold, transform.power
    thr = t * stats.col_sum[None, :] if t < 1.0 else np.full((1, c.shape[1]), t)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        if which == "binary":
            return (c >= thr).astype(np.float64)
        if which == "power":
            kept = np.where(c >= thr, c, 0.0)
            return kept if p == 1.0 else np.power(kept, p)
        if which == "clr":
            v = np.where(c >= thr, c, 0.0)
            v = np.maximum(v, EPSILON)
            mean_log = stats.col_sum_log / stats.col_non_zero
            return np.log(v) * p - mean_log[None, :]
        if which == "pseudocounts":
            if p < 0.0:
                raise InvalidTransformation(("pseudocounts", t, p))
            col_max = stats.col_max[None, :]
            if p == 0.0:
                v = col_max * np.log((c + 1.0) / thr)
            else:
                red_thr = np.maximum(thr - 1.0, 0.0)
                c_p = np.power(red_thr, p)
                if p < 1.0:
                    v = (np.power(c, p) - c_p) * np.power(col_max, 1.0 - p) / p
                else:
                    v = (np.power(c, p) - c_p) / (np.power(thr, p) - c_p)
            return np.maximum(np.floor(v) / stats.col_sum[None, :], 0.0)
    raise UnknownTransformation(which)
