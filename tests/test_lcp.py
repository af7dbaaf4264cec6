"""Boxed-LCP solver unit tests: solution quality vs a host QP oracle and
IFT gradients vs finite differences — the analogue of the reference's
test_Lemke*/LCP units + the LCP-vs-oracle plan of SURVEY.md §4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from diffdart_tpu.ops.lcp import boxed_lcp


def rand_spd(key, n, cond=10.0):
    Q = jax.random.normal(key, (n, n))
    A = Q @ Q.T / n + jnp.eye(n) * 0.1
    return A


def qp_oracle(A, b, lo, hi):
    """Box-constrained QP min 1/2 x'Ax + b'x (valid LCP oracle for symmetric
    PSD A with CONSTANT bounds)."""
    A, b = np.asarray(A), np.asarray(b)
    n = len(b)
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ A @ x + b @ x,
        np.zeros(n),
        jac=lambda x: A @ x + b,
        bounds=list(zip(np.asarray(lo), [None if not np.isfinite(h) else h for h in np.asarray(hi)])),
        method="L-BFGS-B",
        options={"ftol": 1e-16, "gtol": 1e-12, "maxiter": 2000},
    )
    return res.x


class TestSolve:
    def test_matches_qp_oracle_normal_rows(self):
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            k1, k2 = jax.random.split(key)
            n = 8
            A = rand_spd(k1, n)
            b = jax.random.normal(k2, (n,))
            lo = jnp.zeros(n)
            hi = jnp.full(n, jnp.inf)
            mu = jnp.zeros(n)
            fidx = jnp.full(n, -1, jnp.int32)
            lam = boxed_lcp(A, b, lo, hi, mu, fidx, 60)
            ref = qp_oracle(A, b, lo, hi)
            np.testing.assert_allclose(np.asarray(lam), ref, atol=1e-6)

    def test_complementarity(self):
        key = jax.random.PRNGKey(42)
        n = 6
        A = rand_spd(key, n)
        b = jax.random.normal(jax.random.PRNGKey(1), (n,))
        lam = boxed_lcp(A, b, jnp.zeros(n), jnp.full(n, jnp.inf), jnp.zeros(n), jnp.full(n, -1, jnp.int32), 60)
        w = np.asarray(A @ lam + b)
        lam = np.asarray(lam)
        assert np.all(lam >= -1e-10)
        assert np.all(w >= -1e-6)
        assert np.all(np.abs(lam * w) < 1e-6)

    def test_friction_coupling_bounds(self):
        """Friction rows must end inside +-mu*lam_n."""
        key = jax.random.PRNGKey(3)
        n = 6  # 2 contacts: [n0, n1, t0a, t0b, t1a, t1b]
        A = rand_spd(key, n)
        b = jnp.array([-1.0, -2.0, 3.0, -3.0, 0.1, -0.1])
        lo = jnp.zeros(n)
        hi = jnp.concatenate([jnp.full(2, jnp.inf), jnp.zeros(4)])
        mu = jnp.array([0.0, 0.0, 0.7, 0.7, 0.7, 0.7])
        fidx = jnp.array([-1, -1, 0, 0, 1, 1], jnp.int32)
        lam = np.asarray(boxed_lcp(A, b, lo, hi, mu, fidx, 80))
        assert lam[0] > 0 and lam[1] > 0
        for i, f in [(2, 0), (3, 0), (4, 1), (5, 1)]:
            assert abs(lam[i]) <= 0.7 * lam[f] + 1e-9

    def test_disabled_rows_zero(self):
        n = 4
        A = rand_spd(jax.random.PRNGKey(0), n)
        b = -jnp.ones(n)
        lo = jnp.zeros(n).at[2].set(0.0)
        hi = jnp.full(n, jnp.inf).at[2].set(0.0)  # row 2 disabled
        lam = boxed_lcp(A, b, lo, hi, jnp.zeros(n), jnp.full(n, -1, jnp.int32), 50)
        assert float(lam[2]) == 0.0


class TestGradients:
    def _problem(self):
        n = 6
        A = rand_spd(jax.random.PRNGKey(5), n)
        b = jnp.array([-1.0, -2.0, 0.5, -0.4, 2.0, -2.0])
        lo = jnp.zeros(n)
        hi = jnp.concatenate([jnp.full(2, jnp.inf), jnp.zeros(4)])
        mu = jnp.array([0.0, 0.0, 0.6, 0.6, 0.6, 0.6])
        fidx = jnp.array([-1, -1, 0, 0, 1, 1], jnp.int32)
        return A, b, lo, hi, mu, fidx

    def test_grad_b_vs_fd(self):
        A, b, lo, hi, mu, fidx = self._problem()

        def f(b_):
            lam = boxed_lcp(A, b_, lo, hi, mu, fidx, 80)
            return jnp.sum(lam * jnp.arange(1.0, 7.0))

        g = jax.grad(f)(b)
        eps = 1e-7
        for i in range(6):
            d = jnp.zeros(6).at[i].set(eps)
            fd = (f(b + d) - f(b - d)) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5, atol=1e-7)

    def test_grad_A_vs_fd(self):
        A, b, lo, hi, mu, fidx = self._problem()

        def f(A_):
            lam = boxed_lcp(A_, b, lo, hi, mu, fidx, 80)
            return jnp.sum(lam**2)

        g = jax.grad(f)(A)
        eps = 1e-7
        for (i, j) in [(0, 0), (1, 3), (4, 2), (5, 5)]:
            d = jnp.zeros((6, 6)).at[i, j].set(eps)
            fd = (f(A + d) - f(A - d)) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=1e-4, atol=1e-7)

    def test_grad_mu_vs_fd(self):
        A, b, lo, hi, mu, fidx = self._problem()

        def f(mu_):
            lam = boxed_lcp(A, b, lo, hi, mu_, fidx, 80)
            return jnp.sum(lam * jnp.array([0.3, -0.2, 1.0, 0.5, -0.7, 0.2]))

        g = jax.grad(f)(mu)
        eps = 1e-7
        for i in range(2, 6):
            d = jnp.zeros(6).at[i].set(eps)
            fd = (f(mu + d) - f(mu - d)) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-7)


class TestDegenerateGradientGuard:
    def test_redundant_rows_give_finite_gradients(self):
        """Rank-deficient constraint systems (duplicate contact rows — e.g.
        two narrowphase slots landing on the same point) make the active-set
        KKT solve singular; the IFT tangent rule must return a finite (zero)
        subgradient for such envs rather than poisoning the batch with
        NaN/Inf (lcp_lowrank._lowrank_jvp_tangent primal-probe guard)."""
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank

        nv, D = 3, 6
        key = jax.random.PRNGKey(7)
        J_half = jax.random.normal(key, (D // 2, nv))
        J = jnp.concatenate([J_half, J_half])  # exactly duplicated rows
        M = jnp.eye(nv) * 2.0
        b = jnp.array([-1.0, -0.5, 0.3, -1.0, -0.5, 0.3])
        lo = jnp.zeros(D)
        hi = jnp.full(D, jnp.inf)
        mu = jnp.zeros(D)
        fidx = jnp.full(D, -1, jnp.int32)
        cfm = jnp.asarray(1e-9, J.dtype)  # tiny: free subsystem numerically singular

        def f(b_):
            lam = boxed_lcp_lowrank(J, M, cfm, b_, lo, hi, mu, fidx, 8, 2, None)
            return jnp.sum(lam)

        val, g = jax.value_and_grad(f)(b)
        assert bool(jnp.all(jnp.isfinite(g))), g
        assert bool(jnp.isfinite(val))
