import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from ar_orbslam2_tpu.core import lie


def random_rotvecs(rng, n, scale=2.0):
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64)
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=2e-5)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, 64, scale=1.0)
    R = jax.vmap(lie.so3_exp)(jnp.asarray(w))
    w2 = jax.vmap(lie.so3_log)(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=2e-4)


def test_so3_log_near_pi():
    for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 np.array([0.57735, 0.57735, 0.57735])]:
        w = (axis * (np.pi - 1e-4)).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(R))
        R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_so3_exp_small_angle():
    w = jnp.array([1e-9, -1e-9, 1e-9], jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    assert not np.any(np.isnan(np.asarray(R)))


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.standard_normal((32, 6)) * 0.8).astype(np.float32)
    R, t = jax.vmap(lie.se3_exp)(jnp.asarray(xi))
    xi2 = jax.vmap(lie.se3_log)(R, t)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=3e-4)


def test_se3_mul_inv(rng):
    xi = (rng.standard_normal((8, 6)) * 0.5).astype(np.float32)
    R, t = jax.vmap(lie.se3_exp)(jnp.asarray(xi))
    Ri, ti = jax.vmap(lie.se3_inv)(R, t)
    Re, te = jax.vmap(lie.se3_mul)(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Re), np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), np.zeros((8, 3)), atol=1e-5)


def test_sim3_exp_reduces_to_se3(rng):
    xi = (rng.standard_normal((16, 6)) * 0.7).astype(np.float32)
    v = np.concatenate([xi, np.zeros((16, 1), np.float32)], -1)
    R_s, t_s, s = jax.vmap(lie.sim3_exp)(jnp.asarray(v))
    R_e, t_e = jax.vmap(lie.se3_exp)(jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(s), np.ones(16), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R_s), np.asarray(R_e), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_e), atol=1e-4)


def test_sim3_exp_log_roundtrip(rng):
    v = (rng.standard_normal((32, 7)) * 0.6).astype(np.float32)
    R, t, s = jax.vmap(lie.sim3_exp)(jnp.asarray(v))
    v2 = jax.vmap(lie.sim3_log)(R, t, s)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-3)


def test_sim3_mul_inv(rng):
    v = (rng.standard_normal((8, 7)) * 0.5).astype(np.float32)
    R, t, s = jax.vmap(lie.sim3_exp)(jnp.asarray(v))
    Ri, ti, si = jax.vmap(lie.sim3_inv)(R, t, s)
    Re, te, se = jax.vmap(lie.sim3_mul)(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(se), np.ones(8), atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), np.zeros((8, 3)), atol=1e-4)


def test_sim3_apply(rng):
    v = np.array([0.1, -0.2, 0.3, 0.05, 0.1, -0.05, 0.4], np.float32)
    R, t, s = lie.sim3_exp(jnp.asarray(v))
    x = jnp.asarray(rng.standard_normal(3).astype(np.float32))
    y = lie.sim3_apply(R, t, s, x)
    y_ref = float(s) * np.asarray(R) @ np.asarray(x) + np.asarray(t)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 64, scale=2.5)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = jax.vmap(lie.rot_to_quat)(jnp.asarray(R))
    q_ref = Rotation.from_matrix(R).as_quat()  # scipy is (x,y,z,w) too
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(np.asarray(q) * q_ref, -1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q) * sign, q_ref, atol=1e-4)
    R2 = jax.vmap(lie.quat_to_rot)(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
