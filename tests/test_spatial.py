"""Spatial-algebra invariants: power invariance, transform consistency,
inertia transforms — analogue of reference unittests/unit/test_Inertia.cpp."""
import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.math import (
    X_motion,
    exp_se3,
    force_cross,
    inv_transform_motion,
    motion_cross,
    spatial_inertia,
    transform_force,
    transform_inertia,
    transform_motion,
)

KEY = jax.random.PRNGKey(42)


def rand_tf(key, n=16):
    return exp_se3(jax.random.normal(key, (n, 6)))


class TestSpatialTransforms:
    def test_dense_matches_vector_form(self):
        k1, k2 = jax.random.split(KEY)
        R, p = rand_tf(k1)
        V = jax.random.normal(k2, (16, 6))
        np.testing.assert_allclose(
            transform_motion(R, p, V),
            jnp.einsum("...ij,...j->...i", X_motion(R, p), V),
            atol=1e-12,
        )

    def test_inverse_roundtrip(self):
        k1, k2 = jax.random.split(KEY)
        R, p = rand_tf(k1)
        V = jax.random.normal(k2, (16, 6))
        np.testing.assert_allclose(inv_transform_motion(R, p, transform_motion(R, p, V)), V, atol=1e-12)

    def test_power_invariance(self):
        """F . V must be frame independent: F_w . V_w == F_b . V_b."""
        k1, k2, k3 = jax.random.split(KEY, 3)
        R, p = rand_tf(k1)
        V = jax.random.normal(k2, (16, 6))
        F = jax.random.normal(k3, (16, 6))
        lhs = jnp.sum(transform_force(R, p, F) * transform_motion(R, p, V), axis=-1)
        np.testing.assert_allclose(lhs, jnp.sum(F * V, axis=-1), atol=1e-10)

    def test_cross_duality(self):
        """force_cross(v) == -motion_cross(v)^T : <v x* f, m> = -<f, v x m>."""
        k1, k2, k3 = jax.random.split(KEY, 3)
        v = jax.random.normal(k1, (8, 6))
        m = jax.random.normal(k2, (8, 6))
        f = jax.random.normal(k3, (8, 6))
        lhs = jnp.sum(force_cross(v, f) * m, axis=-1)
        rhs = -jnp.sum(f * motion_cross(v, m), axis=-1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_jacobi_like_identity(self):
        """crm(a) b = -crm(b) a (antisymmetry of the Lie bracket)."""
        k1, k2 = jax.random.split(KEY)
        a = jax.random.normal(k1, (8, 6))
        b = jax.random.normal(k2, (8, 6))
        np.testing.assert_allclose(motion_cross(a, b), -motion_cross(b, a), atol=1e-12)


class TestInertia:
    def test_kinetic_energy_point_mass(self):
        """Translating point mass at COM offset c: KE = 1/2 m |v + w x c|^2 + 1/2 w.Iw."""
        mass = jnp.array(2.5)
        com = jnp.array([0.1, -0.2, 0.3])
        I_c = jnp.diag(jnp.array([0.4, 0.5, 0.6]))
        I6 = spatial_inertia(mass, com, I_c)
        w = jnp.array([0.3, -0.1, 0.7])
        v = jnp.array([1.0, 0.5, -0.4])
        V = jnp.concatenate([w, v])
        ke = 0.5 * V @ I6 @ V
        v_com = v + jnp.cross(w, com)
        ke_ref = 0.5 * mass * v_com @ v_com + 0.5 * w @ I_c @ w
        np.testing.assert_allclose(ke, ke_ref, atol=1e-12)

    def test_inertia_transform_preserves_energy(self):
        """KE computed in world coords equals KE in body coords."""
        k1, k2 = jax.random.split(KEY)
        R, p = exp_se3(jax.random.normal(k1, (6,)))
        mass = jnp.array(1.7)
        com = jnp.array([0.05, 0.1, -0.02])
        I_c = jnp.diag(jnp.array([0.2, 0.3, 0.25]))
        I_b = spatial_inertia(mass, com, I_c)
        V_b = jax.random.normal(k2, (6,))
        I_w = transform_inertia(R, p, I_b)
        V_w = transform_motion(R, p, V_b)
        np.testing.assert_allclose(V_w @ I_w @ V_w, V_b @ I_b @ V_b, atol=1e-10)

    def test_inertia_symmetric_psd(self):
        I6 = spatial_inertia(jnp.array(3.0), jnp.array([0.2, 0.1, 0.0]), jnp.diag(jnp.array([0.5, 0.5, 0.9])))
        np.testing.assert_allclose(I6, I6.T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(np.asarray(I6)) > 0)
