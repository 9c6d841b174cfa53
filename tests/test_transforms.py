import math

import numpy as np
import pytest

from kpop_tpu.core.transforms import (
    EPSILON,
    Transformation,
    apply_transform,
    stats_table,
)


def ref_transform_cell(counts, which, threshold, power, col_stats):
    """Scalar transcription of lib/KMerDB.ml:97-144 for golden testing."""
    counts = float(counts)
    thr = threshold * col_stats["sum"] if threshold < 1.0 else threshold
    if which == "binary":
        return 1.0 if counts >= thr else 0.0
    if which == "power":
        if power == 1.0:
            return counts if counts >= thr else 0.0
        return counts**power if counts >= thr else 0.0
    if which == "clr":
        v = counts if counts >= thr else 0.0
        v = max(v, EPSILON)
        return math.log(v) * power - col_stats["sum_log"] / col_stats["non_zero"]
    if which == "pseudocounts":
        if power == 0.0:
            v = col_stats["max"] * math.log((counts + 1.0) / thr)
        else:
            red = max(thr - 1.0, 0.0)
            c_p = red**power
            if power < 1.0:
                v = ((counts**power) - c_p) * (col_stats["max"] ** (1.0 - power)) / power
            else:
                v = ((counts**power) - c_p) / ((thr**power) - c_p)
        return max(math.floor(v) / col_stats["sum"], 0.0)
    raise ValueError(which)


def ref_col_stats(col, threshold, power):
    """Scalar transcription of lib/KMerDB.ml:179-216."""
    pre = sum(float(v) ** power for v in col)
    thr = threshold * pre if threshold < 1.0 else threshold
    st = {"non_zero": 0, "min": 0, "max": 0, "sum": 0.0, "sum_log": 0.0}
    for v in col:
        fv = float(v)
        if fv >= thr:
            st["non_zero"] += 1
            st["min"] = min(st["min"], v)
            st["max"] = max(st["max"], v)
            st["sum"] += fv**power
            st["sum_log"] += math.log(fv) * power if fv > 0 else -math.inf
    return st


COUNTS = np.array(
    [
        [0, 5, 2, 100],
        [3, 0, 7, 1],
        [10, 2, 0, 8],
        [1, 1, 9, 40],
        [0, 0, 4, 2],
    ],
    dtype=np.int32,
)


@pytest.mark.parametrize(
    "which,threshold,power",
    [
        ("power", 1.0, 1.0),
        ("power", 2.0, 1.0),
        ("power", 1.0, 0.5),
        ("power", 0.1, 2.0),
        ("binary", 3.0, 1.0),
        ("binary", 0.2, 1.0),
        ("clr", 1.0, 1.0),
        ("clr", 2.0, 0.5),
        ("pseudocounts", 2.0, 0.0),
        ("pseudocounts", 2.0, 0.5),
        ("pseudocounts", 2.0, 2.0),
        ("pseudocounts", 1.0, 1.0),
    ],
)
def test_transform_matches_scalar_reference(which, threshold, power):
    tr = Transformation(which, threshold, power)
    got = apply_transform(COUNTS, tr)
    for j in range(COUNTS.shape[1]):
        st = ref_col_stats(COUNTS[:, j], threshold, power)
        for i in range(COUNTS.shape[0]):
            want = ref_transform_cell(COUNTS[i, j], which, threshold, power, st)
            assert got[i, j] == pytest.approx(want, rel=1e-12, abs=1e-300), (
                which,
                threshold,
                power,
                i,
                j,
            )


def test_stats_table_matches_scalar_reference():
    tr = Transformation("power", 2.0, 0.5)
    st = stats_table(COUNTS, tr)
    for j in range(COUNTS.shape[1]):
        want = ref_col_stats(COUNTS[:, j], 2.0, 0.5)
        assert st.col_non_zero[j] == want["non_zero"]
        assert st.col_max[j] == want["max"]
        assert st.col_sum[j] == pytest.approx(want["sum"])
    for i in range(COUNTS.shape[0]):
        want = ref_col_stats(COUNTS[i, :], 2.0, 0.5)
        assert st.row_non_zero[i] == want["non_zero"]
        assert st.row_sum[i] == pytest.approx(want["sum"])


def test_fractional_threshold_uses_powered_prepass_sum():
    tr = Transformation("power", 0.5, 2.0)
    st = stats_table(COUNTS, tr)
    col = COUNTS[:, 3].astype(float)
    pre = (col**2).sum()
    want_nz = int((col >= 0.5 * pre).sum())
    assert st.col_non_zero[3] == want_nz
