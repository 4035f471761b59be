"""Arena geometry parity vs reference formulas (common.py:25-121)."""

import numpy as np
import pytest

from radarml_tpu.core.arena import (
    DEFAULT_ARENA,
    Arena,
    cartesian_to_spherical,
    derive_targets,
    slice_projections,
    spherical_to_cartesian,
)


# Reference formula oracles, re-derived in numpy from common.py.
def ref_cart_to_sph(x, y, z):
    r = np.sqrt(x**2 + y**2 + z**2)
    phi = np.arctan2(y, z)
    theta = np.arcsin(x / r)
    return r, np.rad2deg(theta), np.rad2deg(phi)


def ref_sph_to_cart(r, theta, phi):
    t, p = np.deg2rad(theta), np.deg2rad(phi)
    return r * np.sin(t), r * np.cos(t) * np.sin(p), r * np.cos(t) * np.cos(p)


def ref_matrix_indices(a: Arena, x, y, z):
    r, theta, phi = ref_cart_to_sph(x, y, z)
    i = int((theta - a.theta_min) * (a.size_x - 1) / (a.theta_max - a.theta_min))
    j = int((phi - a.phi_min) * (a.size_y - 1) / (a.phi_max - a.phi_min))
    k = int((r - a.r_min) * (a.size_z - 1) / (a.r_max - a.r_min))
    return i, j, k


def test_default_grid_shape():
    # Confirmed (22, 31, 176) in the reference's ground_truth_samples.log.
    assert DEFAULT_ARENA.grid_shape == (22, 31, 176)
    assert DEFAULT_ARENA.feature_length == 10010  # train_sgd.log


def test_plane_shapes():
    a = DEFAULT_ARENA
    assert a.xz_shape == (22, 176)
    assert a.yz_shape == (31, 176)
    assert a.xy_shape == (22, 31)


def test_spherical_roundtrip(rng):
    r = rng.uniform(20, 300, 64)
    theta = rng.uniform(-40, 40, 64)
    phi = rng.uniform(-28, 28, 64)
    x, y, z = spherical_to_cartesian(r, theta, phi)
    rx, ry, rz = ref_sph_to_cart(r, theta, phi)
    np.testing.assert_allclose(np.asarray(x), rx, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ry, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), rz, rtol=1e-5, atol=1e-4)
    r2, t2, p2 = cartesian_to_spherical(x, y, z)
    np.testing.assert_allclose(np.asarray(r2), r, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), theta, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p2), phi, rtol=1e-3, atol=1e-3)


def test_matrix_indices_match_reference(rng):
    a = DEFAULT_ARENA
    for _ in range(100):
        r = rng.uniform(30, 340)
        theta = rng.uniform(-38, 38)
        phi = rng.uniform(-27, 27)
        x, y, z = ref_sph_to_cart(r, theta, phi)
        want = ref_matrix_indices(a, x, y, z)
        got = a.matrix_indices(x, y, z)
        got = tuple(int(v) for v in got)
        # float32 vs float64 rounding can land exactly on an integer
        # boundary; allow off-by-one only there.
        for g, w in zip(got, want):
            assert abs(g - w) <= 1, (got, want, (x, y, z))
        assert got == want or any(
            abs(g - w) == 1 for g, w in zip(got, want)
        )


def test_matrix_indices_exactness_bulk(rng):
    """Vast majority of random in-arena points must match exactly."""
    a = DEFAULT_ARENA
    n, exact = 500, 0
    for _ in range(n):
        r = rng.uniform(30, 340)
        theta = rng.uniform(-38, 38)
        phi = rng.uniform(-27, 27)
        x, y, z = ref_sph_to_cart(r, theta, phi)
        want = ref_matrix_indices(a, x, y, z)
        got = tuple(int(v) for v in a.matrix_indices(x, y, z))
        exact += got == want
    assert exact / n > 0.99


def test_clamped_indices_in_range():
    a = DEFAULT_ARENA
    i, j, k = a.clamped_matrix_indices(1e4, -1e4, 1.0)
    assert 0 <= int(i) < a.size_x
    assert 0 <= int(j) < a.size_y
    assert 0 <= int(k) < a.size_z


def test_slice_projections_matches_numpy(rng):
    a = DEFAULT_ARENA
    cube = rng.random(a.grid_shape, dtype=np.float32)
    i, j, k = 5, 17, 100
    xz, yz, xy = slice_projections(cube, i, j, k)
    np.testing.assert_array_equal(np.asarray(yz), cube[i, :, :])
    np.testing.assert_array_equal(np.asarray(xz), cube[:, j, :])
    np.testing.assert_array_equal(np.asarray(xy), cube[:, :, k])


def test_derive_targets_finds_planted_peak():
    a = DEFAULT_ARENA
    cube = np.zeros(a.grid_shape, dtype=np.float32)
    ti, tj, tk = 10, 20, 80
    cube[ti, tj, tk] = 100.0
    x, y, z, amp = derive_targets(cube, a, num_targets=1)
    i, j, k = a.matrix_indices(float(x[0]), float(y[0]), float(z[0]))
    # Mapping grid→cartesian→grid loses at most one cell to truncation.
    assert abs(int(i) - ti) <= 1
    assert abs(int(j) - tj) <= 1
    assert abs(int(k) - tk) <= 1


def test_arena_validation():
    with pytest.raises(ValueError):
        Arena(r_min=10, r_max=360, r_res=3)  # 350/3 not integral
    with pytest.raises(ValueError):
        Arena(r_min=100, r_max=50)  # max < min
