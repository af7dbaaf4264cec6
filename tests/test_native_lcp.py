"""Native C++ Dantzig pivot solver as the exact oracle (the reference's
odelcpsolver role — SURVEY.md §2.1): cross-checks the batched JAX solvers on
random and physics-derived problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.ops import native_lcp

pytestmark = pytest.mark.skipif(not native_lcp.available(), reason="native lib not buildable")


def _rand_contact_problem(seed, ncon=3, nv=5):
    """Contact-structured random problem with PHYSICAL conditioning: the
    regularizer matches the solver's default CFM scale relative to the
    diagonal, and friction is moderate. (Arbitrary near-singular A with large
    mu can make the coupled friction LCP ill-posed — not representative.)"""
    rng = np.random.default_rng(seed)
    D = 3 * ncon
    J = rng.normal(size=(D, nv))
    Q = rng.normal(size=(nv, nv))
    M = Q @ Q.T / nv + np.eye(nv)
    A = J @ np.linalg.inv(M) @ J.T
    A = A + 1e-3 * np.trace(A) / D * np.eye(D)
    b = rng.normal(size=D)
    lo = np.zeros(D)
    hi = np.concatenate([np.full(ncon, 1e30), np.zeros(2 * ncon)])
    mu = np.concatenate([np.zeros(ncon), np.full(2 * ncon, 0.5)])
    fidx = np.concatenate([np.full(ncon, -1), np.tile(np.arange(ncon), 2)]).astype(np.int32)
    return A, b, lo, hi, mu, fidx, J, M


class TestNativeOracle:
    # NOTE on status 5: the coupled-friction boxed LCP can be near-degenerate
    # (non-unique/ill-posed solution sets for unlucky A with friction
    # coupling — see the gradients-at-contact literature); the oracle then
    # returns its best iterate with status 5. We require the vast majority of
    # contact-structured problems to solve exactly and every exact solve to
    # satisfy complementarity to machine precision.
    def test_complementarity_with_friction(self):
        exact = 0
        for seed in range(6):
            A, b, lo, hi, mu, fidx, _, _ = _rand_contact_problem(seed)
            x, w, st = native_lcp.boxed_lcp_dantzig(A, b, lo, hi, mu, fidx)
            if st != 0:
                continue
            exact += 1
            # normals: 0 <= x, w >= 0, complementary
            nc = 3
            assert np.all(x[:nc] >= -1e-9)
            assert np.all(w[:nc] >= -1e-7)
            assert np.all(np.abs(x[:nc] * w[:nc]) < 1e-7)
            # friction rows within the cone
            for i in range(nc, 3 * nc):
                bound = mu[i] * x[fidx[i]]
                assert abs(x[i]) <= bound + 1e-9
                if abs(x[i]) < bound - 1e-7:  # interior => w = 0
                    assert abs(w[i]) < 1e-7
        assert exact >= 5, f"only {exact}/6 problems solved exactly"

    def test_matches_jax_solvers(self):
        from diffdart_tpu.ops.lcp import boxed_lcp
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank

        for seed in range(4):
            A, b, lo, hi, mu, fidx, J, M = _rand_contact_problem(seed)
            x_native, _, st = native_lcp.boxed_lcp_dantzig(A, b, lo, hi, mu, fidx)
            if st != 0:  # degenerate coupled problem: no unique oracle answer
                continue
            hi_j = jnp.where(jnp.asarray(hi) > 1e29, jnp.inf, jnp.asarray(hi))
            x_pgs = boxed_lcp(
                jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), hi_j,
                jnp.asarray(mu), jnp.asarray(fidx), 60, "pgs", True,
            )
            x_low = boxed_lcp_lowrank(
                jnp.asarray(J), jnp.asarray(M), 1e-3 * float(np.trace(A)) / len(b), jnp.asarray(b),
                jnp.asarray(lo), hi_j, jnp.asarray(mu), jnp.asarray(fidx), 20, 4,
            )
            np.testing.assert_allclose(np.asarray(x_pgs), x_native, atol=2e-5)
            np.testing.assert_allclose(np.asarray(x_low), x_native, atol=2e-5)
