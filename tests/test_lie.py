"""Unit tests for SO(3)/SE(3)/quaternion ops — the analogue of the reference's
unittests/unit/test_Geometry.cpp exp/log/adjoint identity checks (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.math import (
    exp_se3,
    exp_so3,
    log_se3,
    log_so3,
    mat_to_quat,
    quat_exp,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    skew,
    tf_apply,
    tf_compose,
    tf_inverse,
)

KEYS = jax.random.split(jax.random.PRNGKey(0), 8)


def rand_w(key, scale=2.0, n=64):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_is_rotation(self):
        R = exp_so3(rand_w(KEYS[0]))
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    def test_exp_log_roundtrip(self):
        # sample within the injectivity radius (|w| < pi)
        w = rand_w(KEYS[1], scale=1.0)
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jax.random.uniform(KEYS[2], (64, 1), minval=1e-3, maxval=3.1)
        np.testing.assert_allclose(log_so3(exp_so3(w)), w, atol=1e-9)

    def test_log_near_pi(self):
        for axis in [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), np.array([0.3, -0.5, 0.81])]:
            axis = axis / np.linalg.norm(axis)
            w = axis * (np.pi - 1e-6)
            R = exp_so3(jnp.asarray(w))
            w2 = np.asarray(log_so3(R))
            np.testing.assert_allclose(np.asarray(exp_so3(jnp.asarray(w2))), np.asarray(R), atol=1e-6)

    def test_exp_zero(self):
        R = exp_so3(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-15)

    def test_grad_at_zero_finite(self):
        g = jax.jacobian(exp_so3)(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        # dR/dw at identity is the skew generator
        np.testing.assert_allclose(np.asarray(g)[:, :, 0], np.asarray(skew(jnp.array([1.0, 0, 0]))), atol=1e-8)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEYS[2], (64, 6))
        # keep the angular part within the injectivity radius
        wn = jnp.linalg.norm(xi[..., :3], axis=-1, keepdims=True)
        xi = xi.at[..., :3].multiply(2.8 / jnp.maximum(wn, 2.8))
        R, p = exp_se3(xi)
        np.testing.assert_allclose(log_se3(R, p), xi, atol=1e-9)

    def test_pure_translation(self):
        xi = jnp.array([0.0, 0, 0, 1.0, 2.0, 3.0])
        R, p = exp_se3(xi)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-15)
        np.testing.assert_allclose(p, [1.0, 2.0, 3.0], atol=1e-15)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEYS[3], (16, 6))
        R, p = exp_se3(xi)
        Ri, pi = tf_inverse(R, p)
        Rc, pc = tf_compose(R, p, Ri, pi)
        np.testing.assert_allclose(Rc, np.broadcast_to(np.eye(3), Rc.shape), atol=1e-12)
        np.testing.assert_allclose(pc, 0.0, atol=1e-12)

    def test_apply(self):
        R, p = exp_se3(jax.random.normal(KEYS[4], (6,)))
        x = jnp.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(tf_apply(R, p, x), R @ x + p, atol=1e-12)


class TestQuat:
    def test_quat_mat_consistency(self):
        w = rand_w(KEYS[5], scale=1.5)
        np.testing.assert_allclose(quat_to_mat(quat_exp(w)), exp_so3(w), atol=1e-10)

    def test_mat_to_quat_roundtrip(self):
        w = rand_w(KEYS[6], scale=2.5)
        R = exp_so3(w)
        q = mat_to_quat(R)
        np.testing.assert_allclose(quat_to_mat(q), R, atol=1e-9)

    def test_quat_exp_log(self):
        w = rand_w(KEYS[7], scale=1.0)
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * jax.random.uniform(KEYS[6], (64, 1), minval=1e-3, maxval=3.1)
        np.testing.assert_allclose(quat_log(quat_exp(w)), w, atol=1e-9)

    def test_rotate_matches_matrix(self):
        q = quat_normalize(jax.random.normal(KEYS[0], (32, 4)))
        v = jax.random.normal(KEYS[1], (32, 3))
        np.testing.assert_allclose(
            quat_rotate(q, v), jnp.einsum("...ij,...j->...i", quat_to_mat(q), v), atol=1e-10
        )

    def test_mul_matches_matrix_product(self):
        qa = quat_exp(rand_w(KEYS[2], n=8))
        qb = quat_exp(rand_w(KEYS[3], n=8))
        np.testing.assert_allclose(
            quat_to_mat(quat_mul(qa, qb)), quat_to_mat(qa) @ quat_to_mat(qb), atol=1e-10
        )
