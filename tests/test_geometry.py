import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from ar_orbslam2_tpu.core import geometry, camera, lie


def make_two_views(rng, n=100):
    """Random scene + two cameras looking at it."""
    xw = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    xw[:, 2] += 4.0
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    R2 = Rotation.from_rotvec([0.02, -0.3, 0.01]).as_matrix().astype(np.float32)
    t2 = np.array([-0.8, 0.05, 0.1], np.float32)
    def proj(R, t):
        xc = xw @ R.T + t
        return (xc[:, :2] / xc[:, 2:3]).astype(np.float32), xc[:, 2]
    xn1, z1 = proj(R1, t1)
    xn2, z2 = proj(R2, t2)
    return xw, (R1, t1), (R2, t2), xn1, xn2


def test_triangulate_linear(rng):
    xw, (R1, t1), (R2, t2), xn1, xn2 = make_two_views(rng)
    est = geometry.triangulate_linear(jnp.asarray(R1), jnp.asarray(t1),
                                      jnp.asarray(R2), jnp.asarray(t2),
                                      jnp.asarray(xn1), jnp.asarray(xn2))
    np.testing.assert_allclose(np.asarray(est), xw, atol=1e-2)


def test_triangulate_with_noise(rng):
    xw, (R1, t1), (R2, t2), xn1, xn2 = make_two_views(rng, n=200)
    xn1 += rng.standard_normal(xn1.shape).astype(np.float32) * 5e-4
    xn2 += rng.standard_normal(xn2.shape).astype(np.float32) * 5e-4
    est = geometry.triangulate_linear(jnp.asarray(R1), jnp.asarray(t1),
                                      jnp.asarray(R2), jnp.asarray(t2),
                                      jnp.asarray(xn1), jnp.asarray(xn2))
    err = np.linalg.norm(np.asarray(est) - xw, axis=1)
    assert np.median(err) < 0.05


def test_epipolar_distance_zero_for_true_matches(rng):
    xw, (R1, t1), (R2, t2), xn1, xn2 = make_two_views(rng)
    cam = camera.Camera(fx=500, fy=500, cx=320, cy=240)
    K = np.asarray(cam.K)
    uv1 = xn1 @ np.diag([500, 500]) + np.array([320, 240])
    uv2 = xn2 @ np.diag([500, 500]) + np.array([320, 240])
    # relative pose view1 -> view2
    R12 = R2 @ R1.T
    t12 = t2 - R12 @ t1
    F = geometry.fundamental_from_pose(jnp.asarray(R12), jnp.asarray(t12),
                                       jnp.asarray(K), jnp.asarray(K))
    d = geometry.epipolar_sq_dist(F, jnp.asarray(uv1, jnp.float32),
                                  jnp.asarray(uv2, jnp.float32))
    assert float(jnp.max(d)) < 1e-2


def test_decompose_essential(rng):
    R12 = Rotation.from_rotvec([0.1, 0.2, -0.05]).as_matrix().astype(np.float32)
    t12 = np.array([0.5, -0.2, 0.1], np.float32)
    t12 /= np.linalg.norm(t12)
    E = geometry.essential_from_pose(jnp.asarray(R12), jnp.asarray(t12))
    R1, R2, t = geometry.decompose_essential(E)
    ok = False
    for Rc in (np.asarray(R1), np.asarray(R2)):
        for tc in (np.asarray(t), -np.asarray(t)):
            if (np.allclose(Rc, R12, atol=1e-4)
                    and np.allclose(tc, t12, atol=1e-4)):
                ok = True
    assert ok


def test_parallax_and_center():
    R = np.asarray(lie.so3_exp(jnp.array([0.0, 0.1, 0.0])))
    t = np.array([1.0, 0.0, 0.0], np.float32)
    c = geometry.camera_center(jnp.asarray(R), jnp.asarray(t))
    # R @ c + t == 0
    np.testing.assert_allclose(R @ np.asarray(c) + t, 0.0, atol=1e-6)


def test_undistort_roundtrip(rng):
    cam = camera.Camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                        k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026,
                        k3=1.1633)
    # distort ideal points, then undistort back
    uv_ideal = rng.uniform([100, 100], [540, 380], (50, 2)).astype(np.float32)
    xy = camera.normalize_pixels(cam, jnp.asarray(uv_ideal))
    xy_d = camera.distort_normalized(cam, xy)
    uv_raw = jnp.stack([cam.fx * xy_d[:, 0] + cam.cx,
                        cam.fy * xy_d[:, 1] + cam.cy], -1)
    uv_back = camera.undistort_points(cam, uv_raw, iters=20)
    np.testing.assert_allclose(np.asarray(uv_back), uv_ideal, atol=0.1)


def test_project_backproject(rng):
    cam = camera.Camera(fx=500, fy=510, cx=320, cy=240)
    xc = rng.uniform([-1, -1, 2], [1, 1, 6], (30, 3)).astype(np.float32)
    uv = camera.project(cam, jnp.asarray(xc))
    back = camera.backproject(cam, uv, jnp.asarray(xc[:, 2]))
    np.testing.assert_allclose(np.asarray(back), xc, atol=1e-4)
