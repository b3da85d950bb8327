"""AR layer: plane RANSAC, cube anchoring, overlay render, marker pose."""
import numpy as np

from ar_orbslam2_tpu.ar.marker import marker_object_points, pose_from_homography
from ar_orbslam2_tpu.ar.plane import detect_plane
from ar_orbslam2_tpu.ar.viewer import ViewerAR
from ar_orbslam2_tpu.core.camera import Camera

CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def test_detect_plane():
    rng = np.random.default_rng(0)
    n_in, n_out = 200, 60
    # plane y = 0.5 with noise, plus outliers above it
    pts = np.zeros((n_in + n_out, 3), np.float32)
    pts[:n_in, 0] = rng.uniform(-2, 2, n_in)
    pts[:n_in, 2] = rng.uniform(2, 6, n_in)
    pts[:n_in, 1] = 0.5 + rng.normal(0, 0.005, n_in)
    pts[n_in:] = rng.uniform([-2, -2, 2], [2, 0.3, 6], (n_out, 3))
    valid = np.ones(len(pts), bool)
    plane = detect_plane(pts, valid, cam_center=np.array([0, -3.0, 0]))
    assert plane is not None
    assert abs(abs(plane.normal[1]) - 1.0) < 0.02
    assert abs(plane.origin[1] - 0.5) < 0.05
    # normal oriented toward the camera (camera is at y=-3 < plane)
    assert plane.normal[1] < 0
    # T_pw orthonormal
    Rp = plane.T_pw[:3, :3]
    assert np.abs(Rp @ Rp.T - np.eye(3)).max() < 1e-9


def test_viewer_add_cube_and_render():
    rng = np.random.default_rng(1)
    pts = np.zeros((150, 3), np.float32)
    pts[:, 0] = rng.uniform(-1, 1, 150)
    pts[:, 1] = 0.8
    pts[:, 2] = rng.uniform(3, 5, 150)
    viewer = ViewerAR(cam=CAM)
    Tcw = np.eye(4, dtype=np.float32)
    cube = viewer.add_cube(pts, np.ones(150, bool), Tcw=Tcw, size=0.2)
    assert cube is not None
    im = np.zeros((480, 640), np.uint8)
    out = viewer.render(im, Tcw, tracked_uv=np.array([[100.0, 100.0]]),
                        state="OK", n_tracked=150)
    assert out.ndim == 3 and out.shape[1] == 640
    assert out.max() > 0              # something was drawn
    viewer.clear()
    assert not viewer.cubes


def test_marker_pose_from_homography():
    from ar_orbslam2_tpu.core import lie
    import jax.numpy as jnp
    obj = marker_object_points(0.2)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)))
    t = np.array([0.1, -0.05, 1.5], np.float32)
    xc = obj @ R.T + t
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240], -1)
    Re, te = pose_from_homography(CAM, obj[:, :2], uv)
    assert np.abs(Re - R).max() < 1e-3
    assert np.abs(te - t).max() < 5e-3
