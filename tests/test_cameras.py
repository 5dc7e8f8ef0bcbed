"""Camera model tests — analog of reference TestPinholeCamera
(/root/reference/okvis_cv/test/TestPinholeCamera.cpp:43): random points,
project∘backProject ≈ identity, Jacobians vs numeric differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis_tpu import cameras
from okvis_tpu.cameras import CameraSpec


# EuRoC-like parameter sets for each distortion model.
SPECS = {
    "none": (CameraSpec(752, 480, "none"), [458.0, 457.0, 367.0, 248.0]),
    "radtan": (
        CameraSpec(752, 480, "radtan"),
        [458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739, 2e-4, 1.76e-5],
    ),
    "radtan8": (
        CameraSpec(752, 480, "radtan8"),
        [458.654, 457.296, 367.215, 248.375, -0.28, 0.07, 2e-4, 1.7e-5, 0.001, -0.002, 0.0005, -0.0001],
    ),
    "equidistant": (
        CameraSpec(752, 480, "equidistant"),
        [460.0, 458.0, 367.0, 248.0, -0.0028, 0.0007, -0.0022, 0.0005],
    ),
}


@pytest.fixture(params=list(SPECS.keys()))
def camera(request):
    spec, intr = SPECS[request.param]
    return spec, jnp.asarray(intr)


def random_visible_points(rng, spec, intr, n=200):
    """Sample pixels well inside the image, backproject, scale by random depth."""
    uv = np.stack(
        [
            rng.uniform(50, spec.width - 50, n),
            rng.uniform(50, spec.height - 50, n),
        ],
        axis=-1,
    )
    rays = jax.vmap(lambda p: cameras.back_project(spec, intr, p))(jnp.asarray(uv))
    depth = jnp.asarray(rng.uniform(0.5, 10.0, (n, 1)))
    return rays * depth, uv


def test_project_backproject_roundtrip(camera, rng):
    spec, intr = camera
    pts, uv = random_visible_points(rng, spec, intr)
    uv2, flags = jax.vmap(lambda p: cameras.project(spec, intr, p))(pts)
    assert np.all(np.asarray(flags) == cameras.STATUS_OK)
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-6)


def test_undistort_roundtrip(camera, rng):
    spec, intr = camera
    if spec.dist_type == "none":
        return
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, (100, 2)))
    xy_d = cameras.distort(spec.dist_type, intr[4:], xy)
    xy_u = jax.vmap(lambda p: cameras.undistort(spec.dist_type, intr[4:], p))(xy_d)
    np.testing.assert_allclose(np.asarray(xy_u), np.asarray(xy), atol=1e-8)


def test_point_jacobian_numeric(camera, rng):
    spec, intr = camera
    pts, _ = random_visible_points(rng, spec, intr, n=20)
    for i in range(20):
        p = pts[i]
        J = cameras.project_jacobian_point(spec, intr, p)
        h = 1e-7
        Jn = np.zeros((2, 3))
        for k in range(3):
            dp = jnp.zeros(3).at[k].set(h)
            up, _ = cameras.project(spec, intr, p + dp)
            um, _ = cameras.project(spec, intr, p - dp)
            Jn[:, k] = (np.asarray(up) - np.asarray(um)) / (2 * h)
        np.testing.assert_allclose(np.asarray(J), Jn, atol=1e-4)


def test_intrinsics_jacobian_numeric(camera, rng):
    spec, intr = camera
    pts, _ = random_visible_points(rng, spec, intr, n=5)
    for i in range(5):
        p = pts[i]
        J = cameras.project_jacobian_intrinsics(spec, intr, p)
        h = 1e-6
        Jn = np.zeros((2, spec.num_intrinsics))
        for k in range(spec.num_intrinsics):
            di = jnp.zeros(spec.num_intrinsics).at[k].set(h)
            up, _ = cameras.project(spec, intr + di, p)
            um, _ = cameras.project(spec, intr - di, p)
            Jn[:, k] = (np.asarray(up) - np.asarray(um)) / (2 * h)
        np.testing.assert_allclose(np.asarray(J), Jn, atol=1e-3)


def test_projection_status_flags():
    spec, intr = SPECS["radtan"]
    intr = jnp.asarray(intr)
    # behind camera
    _, flags = cameras.project(spec, intr, jnp.asarray([0.0, 0.0, -2.0]))
    assert int(flags) & cameras.STATUS_BEHIND
    # near-singular z
    _, flags = cameras.project(spec, intr, jnp.asarray([0.1, 0.1, 1e-15]))
    assert int(flags) & cameras.STATUS_INVALID
    # far outside image
    _, flags = cameras.project(spec, intr, jnp.asarray([5.0, 0.0, 1.0]))
    assert int(flags) & cameras.STATUS_OUTSIDE


def test_homogeneous_projection_matches_euclidean(rng):
    spec, intr = SPECS["radtan"]
    intr = jnp.asarray(intr)
    p = jnp.asarray([0.3, -0.2, 2.0])
    uv_e, _ = cameras.project(spec, intr, p)
    uv_h, _ = cameras.project_homogeneous(spec, intr, jnp.concatenate([p * 0.5, jnp.asarray([0.5])]))
    np.testing.assert_allclose(np.asarray(uv_e), np.asarray(uv_h), atol=1e-9)


def test_stereo_rig_overlaps():
    from okvis_tpu.kinematics import SE3
    import okvis_tpu.kinematics as kin

    spec, intr = SPECS["radtan"]
    intr = jnp.asarray(intr)
    # EuRoC-like stereo: ~11 cm baseline along x, parallel optical axes
    T0 = SE3(r=jnp.zeros(3), q=kin.quat_identity())
    T1 = SE3(r=jnp.asarray([0.11, 0.0, 0.0]), q=kin.quat_identity())
    rig = cameras.make_stereo_rig([spec, spec], [T0, T1], [intr, intr])
    assert rig.has_overlap(0, 1) and rig.has_overlap(1, 0)
    assert rig.has_overlap(0, 0)
    # opposite-facing cameras don't overlap
    q_back = jnp.asarray([0.0, 1.0, 0.0, 0.0])  # 180° about y
    T2 = SE3(r=jnp.asarray([0.11, 0.0, 0.0]), q=q_back)
    rig2 = cameras.make_stereo_rig([spec, spec], [T0, T2], [intr, intr])
    assert not rig2.has_overlap(0, 1)
