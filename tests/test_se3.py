"""SE(3) ops vs. NumPy/SciPy-style oracles (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_rgbd_tpu.core import se3


def random_twists(rng, n, scale_t=1.0, scale_r=1.0):
    v = rng.normal(size=(n, 3)) * scale_t
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    angles = rng.uniform(-np.pi * 0.95, np.pi * 0.95, size=(n, 1)) * scale_r
    return np.concatenate([v, w * angles], axis=1).astype(np.float32)


def np_expm_se3(xi):
    """Oracle: matrix exponential via scipy-free series (numpy, float64)."""
    v, w = xi[:3].astype(np.float64), xi[3:].astype(np.float64)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    A = np.zeros((4, 4))
    A[:3, :3] = W
    A[:3, 3] = v
    # scaling & squaring series
    E = np.eye(4)
    term = np.eye(4)
    for k in range(1, 30):
        term = term @ A / k
        E = E + term
    return E


class TestExpLog:
    def test_exp_matches_matrix_exponential(self, rng):
        xs = random_twists(rng, 50)
        got = np.asarray(se3.exp_batch(jnp.asarray(xs)))
        for xi, T in zip(xs, got):
            np.testing.assert_allclose(T, np_expm_se3(xi), atol=2e-5)

    def test_log_roundtrip(self, rng):
        xs = random_twists(rng, 100)
        T = se3.exp_batch(jnp.asarray(xs))
        back = np.asarray(se3.log_batch(T))
        np.testing.assert_allclose(back, xs, atol=5e-4)

    def test_zero_twist(self):
        T = se3.exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)
        np.testing.assert_allclose(np.asarray(se3.log(jnp.eye(4))), np.zeros(6), atol=1e-7)

    def test_near_pi_rotation(self, rng):
        w = np.array([0.0, 0.0, np.pi - 1e-3], dtype=np.float32)
        xi = np.concatenate([np.zeros(3, np.float32), w])
        T = se3.exp(jnp.asarray(xi))
        back = np.asarray(se3.log(T))
        np.testing.assert_allclose(back, xi, atol=2e-3)

    def test_grad_safe_at_zero(self):
        g = jax.grad(lambda x: jnp.sum(se3.exp(x)))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))


class TestGroupOps:
    def test_inverse(self, rng):
        xs = random_twists(rng, 20)
        T = se3.exp_batch(jnp.asarray(xs))
        I = jax.vmap(lambda t: se3.inverse(t) @ t)(T)
        np.testing.assert_allclose(np.asarray(I), np.tile(np.eye(4), (20, 1, 1)), atol=1e-5)

    def test_transform_points(self, rng):
        xi = random_twists(rng, 1)[0]
        T = se3.exp(jnp.asarray(xi))
        pts = jnp.asarray(rng.normal(size=(17, 3)).astype(np.float32))
        got = se3.transform_points(T, pts)
        Tn = np.asarray(T)
        want = pts @ Tn[:3, :3].T + Tn[:3, 3]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_adjoint_transport(self, rng):
        """Ad_T xi acts as T exp(xi) T^-1 = exp(Ad_T xi)."""
        xiT = random_twists(rng, 1)[0]
        xi = 0.1 * random_twists(rng, 1)[0]
        T = se3.exp(jnp.asarray(xiT))
        lhs = np.asarray(T @ se3.exp(jnp.asarray(xi)) @ se3.inverse(T))
        rhs = np.asarray(se3.exp(se3.adjoint(T) @ jnp.asarray(xi)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_normalize_rotation(self, rng):
        xi = random_twists(rng, 1)[0]
        T = np.array(se3.exp(jnp.asarray(xi)))  # writable copy
        T[:3, :3] += rng.normal(size=(3, 3)) * 1e-3  # drift
        Tn = np.asarray(se3.normalize_rotation(jnp.asarray(T)))
        R = Tn[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_geodesic_distance(self):
        A = se3.identity()
        # Build B directly (exp of a mixed twist couples v through J_l(w),
        # so its translation norm would not be |v|).
        B = se3.exp(jnp.asarray([0, 0, 0, 0, 0, 0.5], dtype=jnp.float32))
        B = B.at[:3, 3].set(jnp.asarray([1.0, 0, 0]))
        t, r = se3.geodesic_distance(A, B)
        assert abs(float(t) - 1.0) < 1e-5
        assert abs(float(r) - 0.5) < 1e-5
