"""Multi-chip sharded paths on a virtual 8-device CPU mesh must agree with
the single-device numpy golden paths (SURVEY.md §4)."""

import numpy as np
import pytest

from kpop_tpu.core.ca import fit_ca


@pytest.fixture(scope="module")
def mesh():
    from kpop_tpu.parallel.mesh import make_mesh

    m = make_mesh(8)
    assert m.devices.size == 8
    return m


def test_mesh_axes(mesh):
    from kpop_tpu.parallel.mesh import DATA_AXIS, KMER_AXIS

    assert set(mesh.axis_names) == {DATA_AXIS, KMER_AXIS}


def test_ca_fit_sharded_matches_host(mesh):
    from kpop_tpu.parallel.sharded import ca_fit_sharded

    rng = np.random.default_rng(0)
    table = rng.integers(0, 30, size=(101, 7)).astype(np.float64) + 0.05
    coords, inertia, twister, sv = ca_fit_sharded(mesh, table)
    want = fit_ca(table)
    np.testing.assert_allclose(inertia, want.inertia, rtol=1e-3, atol=1e-6)
    for j in range(want.n_dims):
        a, b = coords[:, j], want.sample_coords[:, j]
        sign = 1.0 if np.dot(a, b) >= 0 else -1.0
        np.testing.assert_allclose(a, sign * b, rtol=1e-2, atol=1e-4)
        np.testing.assert_allclose(
            twister[j], sign * want.twister[j], rtol=1e-2, atol=1e-4
        )


def test_project_sharded_matches_host(mesh):
    from kpop_tpu.parallel.sharded import project_sharded

    rng = np.random.default_rng(1)
    spectra = rng.random((13, 50)).astype(np.float32)
    tw = rng.standard_normal((50, 6)).astype(np.float32)
    got = project_sharded(mesh, spectra, tw)
    want = (spectra / spectra.sum(axis=1, keepdims=True)) @ tw
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_pairwise_sharded_matches_host(mesh):
    from kpop_tpu.core.matrix import NamedMatrix
    from kpop_tpu.core.space import Distance, distance_rowwise
    from kpop_tpu.parallel.sharded import pairwise_sharded

    rng = np.random.default_rng(2)
    d = 9
    queries = rng.standard_normal((21, d))
    targets = rng.standard_normal((5, d))
    metric = rng.random(d)
    metric /= metric.sum()
    got = pairwise_sharded(mesh, queries, targets, metric)
    m1 = NamedMatrix([f"t{i}" for i in range(5)], [f"d{j}" for j in range(d)], targets)
    m2 = NamedMatrix([f"q{i}" for i in range(21)], [f"d{j}" for j in range(d)], queries)
    want = distance_rowwise(Distance.of_string("euclidean"), metric, m1, m2).data
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
