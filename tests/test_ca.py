import numpy as np
import pytest

from kpop_tpu.core.ca import fit_ca


def svd_reference(N):
    """Direct full-SVD CA (textbook formulation, as R's ca computes it)."""
    N = N.astype(float)
    total = N.sum()
    P = N / total
    r = P.sum(axis=1)
    c = P.sum(axis=0)
    S = (P - np.outer(r, c)) / np.sqrt(np.outer(r, c))
    U, sv, Vt = np.linalg.svd(S, full_matrices=False)
    d = min(N.shape) - 1
    U, sv, Vt = U[:, :d], sv[:d], Vt[:d, :]
    col_principal = (Vt.T * sv[None, :]) / np.sqrt(c)[:, None]
    row_standard = U / np.sqrt(r)[:, None]
    inertia = sv**2 / (sv**2).sum()
    return col_principal, inertia, row_standard.T


def random_table(rng, nk=50, ns=8):
    return rng.integers(0, 20, size=(nk, ns)).astype(float) + 0.1


def test_ca_matches_full_svd_up_to_sign():
    rng = np.random.default_rng(0)
    N = random_table(rng)
    res = fit_ca(N)
    want_coords, want_inertia, want_twister = svd_reference(N)
    assert res.inertia == pytest.approx(want_inertia, rel=1e-9)
    assert res.sample_coords.shape == want_coords.shape
    assert res.twister.shape == want_twister.shape
    # match up to per-dimension sign
    for j in range(res.n_dims):
        a, b = res.sample_coords[:, j], want_coords[:, j]
        sign = 1.0 if np.dot(a, b) >= 0 else -1.0
        np.testing.assert_allclose(a, sign * b, rtol=1e-8, atol=1e-10)
        ta, tb = res.twister[j], want_twister[j]
        np.testing.assert_allclose(ta, sign * tb, rtol=1e-8, atol=1e-10)


def test_projection_identity():
    """Projecting a training column profile through the twister must yield
    that sample's principal coordinates (the CA transition relation that the
    reference's -k action relies on, lib/Twister.ml:146-188)."""
    rng = np.random.default_rng(1)
    N = random_table(rng, nk=40, ns=6)
    res = fit_ca(N)
    profiles = N / N.sum(axis=0, keepdims=True)
    projected = (res.twister @ profiles).T  # [ns, d]
    np.testing.assert_allclose(projected, res.sample_coords, rtol=1e-7, atol=1e-9)


def test_dim_names_and_count():
    rng = np.random.default_rng(2)
    N = random_table(rng, nk=30, ns=10)
    res = fit_ca(N)
    assert res.n_dims == 9
    assert res.dim_names == ["Dim%d" % i for i in range(1, 10)]


def test_inertia_sorted_decreasing():
    rng = np.random.default_rng(3)
    res = fit_ca(random_table(rng))
    assert all(np.diff(res.inertia) <= 1e-12)


# ---------------- external golden cross-validation ----------------
# Greenacre's "smoke" dataset ("Correspondence Analysis in Practice";
# shipped as data(smoke) in R's ca package -- the very package the reference
# delegates twisting to, src/KPopTwist:95-116).  The principal inertias
# 0.074759 / 0.010017 / 0.000414 (87.76% / 11.76% / 0.49%) and the principal
# coordinates below are published to 4 decimals in the book and the ca-package
# docs; the 10-decimal values were captured once from an independent
# full-SVD-of-residuals computation that reproduces the published 4-decimal
# values exactly.  A drift in mass handling, residual scaling, or the
# inertia convention fails this test even if the Gram-trick algebra stays
# self-consistent.

SMOKE = np.array(
    [
        # none light medium heavy  (staff groups SM JM SE JE SC)
        [4, 2, 3, 2],
        [4, 3, 7, 4],
        [25, 10, 12, 4],
        [18, 24, 33, 13],
        [10, 6, 7, 2],
    ],
    dtype=np.float64,
)

SMOKE_PRINCIPAL_INERTIAS = np.array(
    [0.0747591059, 0.0100171805, 0.0004135741]
)

# column (smoking-category) principal coordinates == our sample_coords
SMOKE_COL_PRINCIPAL = np.array(
    [
        [-0.3933084486, -0.0304920711, -0.0008904827],
        [0.0994559208, 0.1410642892, 0.0219980349],
        [0.1963209564, 0.0073591086, -0.0256590867],
        [0.2937759852, -0.1977656563, 0.0262108499],
    ]
)

# row (staff-group) standard coordinates == our twister^T
SMOKE_ROW_STANDARD = np.array(
    [
        [-0.2405387894, -1.9357079271, 3.4903230977],
        [0.9471046954, -2.4309583897, -1.6573724681],
        [-1.3919732851, -0.1065076185, -0.2535221013],
        [0.8519894617, 0.5769436808, 0.1625337463],
        [-0.7354557171, 0.7884353138, -0.3973676862],
    ]
)


def _align_signs(got: np.ndarray, want: np.ndarray) -> np.ndarray:
    """CA coordinates are defined up to per-dimension sign."""
    signs = np.sign((got * want).sum(axis=0))
    signs = np.where(signs == 0, 1.0, signs)
    return got * signs[None, :]


def test_ca_smoke_golden():
    res = fit_ca(SMOKE)
    assert res.n_dims == 3
    np.testing.assert_allclose(
        res.sv**2, SMOKE_PRINCIPAL_INERTIAS, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        res.inertia,
        SMOKE_PRINCIPAL_INERTIAS / SMOKE_PRINCIPAL_INERTIAS.sum(),
        rtol=0,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        _align_signs(res.sample_coords, SMOKE_COL_PRINCIPAL),
        SMOKE_COL_PRINCIPAL,
        rtol=0,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        _align_signs(res.twister.T, SMOKE_ROW_STANDARD),
        SMOKE_ROW_STANDARD,
        rtol=0,
        atol=1e-9,
    )
    # published 4-decimal book values as a second, human-auditable anchor
    np.testing.assert_allclose(
        res.sv**2, [0.074759, 0.010017, 0.000414], atol=5e-7
    )
    pct = res.inertia * 100
    np.testing.assert_allclose(pct, [87.76, 11.76, 0.49], atol=0.005)


def test_ca_smoke_golden_sharded_backend():
    """The device/sharded CA must hit the same external fixture."""
    from kpop_tpu.parallel.mesh import make_mesh
    from kpop_tpu.parallel.sharded import ca_fit_sharded

    mesh = make_mesh()
    coords, inertia, twister, sv = ca_fit_sharded(mesh, SMOKE)
    np.testing.assert_allclose(
        np.asarray(sv) ** 2, SMOKE_PRINCIPAL_INERTIAS, rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        _align_signs(np.asarray(coords), SMOKE_COL_PRINCIPAL),
        SMOKE_COL_PRINCIPAL,
        rtol=0,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        _align_signs(np.asarray(twister).T, SMOKE_ROW_STANDARD),
        SMOKE_ROW_STANDARD,
        rtol=0,
        atol=2e-4,
    )
