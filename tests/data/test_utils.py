import numpy as np

from keras_nerf_tpu.data import (
    get_focal_from_fov,
    pose_spherical,
)


def test_focal_golden():
    """Golden value from the reference test suite
    (`tests/data/test_utils.py:5-10` in /root/reference)."""
    focal = get_focal_from_fov(0.6911112070083618, 100)
    np.testing.assert_allclose(focal, 138.88887889922103, rtol=1e-9)


def test_pose_spherical_structure():
    c2w = pose_spherical(0.0, 0.0, 4.0)
    assert c2w.shape == (4, 4)
    # Bottom row of a rigid transform.
    np.testing.assert_allclose(c2w[3], [0, 0, 0, 1], atol=1e-7)
    # Camera sits at distance 4 from the origin for any angles.
    for theta, phi in [(0, 0), (90, -30), (123, -45), (350, -60)]:
        c2w = pose_spherical(theta, phi, 4.0)
        np.testing.assert_allclose(np.linalg.norm(c2w[:3, -1]), 4.0, rtol=1e-6)
    # Rotation block is orthonormal.
    r = pose_spherical(37.0, -25.0, 4.0)[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_pose_spherical_theta_orbits():
    """theta sweeps the camera around the up axis at fixed height."""
    heights = [pose_spherical(t, -30.0, 4.0)[2, -1] for t in range(0, 360, 40)]
    np.testing.assert_allclose(heights, heights[0] * np.ones(len(heights)),
                               rtol=1e-5)
