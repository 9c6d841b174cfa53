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
