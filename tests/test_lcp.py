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


class TestPivotRefine:
    """Dantzig-grade robustness on rank-deficient contact sets (r2 VERDICT
    missing #3): the single-flip principal-pivoting refinement
    (ops/lcp_pivot.py) must close the policy-iteration chain's spurious
    fixed points — redundant capsule/cube contact states where the plain
    jacobi+polish chain left natural-map residuals up to ~1e-1."""

    def _population(self, model, q0, tilt_scale, h_lo, h_rng, n=16, seed=0):
        from diffdart_tpu.math.lie import quat_exp, quat_mul
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.sim.constrained import prepare_constrained

        rng = np.random.default_rng(seed)
        probs = []
        for k in range(n):
            q = np.array(q0, float)
            dq = np.asarray(quat_exp(jnp.asarray(rng.normal(size=3) * tilt_scale)))
            q[:4] = np.asarray(quat_mul(jnp.asarray(q[:4]), jnp.asarray(dq)))
            q[6] = h_lo + h_rng * rng.random()
            v = rng.normal(size=model.nv) * (2.0 if k % 2 else 0.3)
            s = make_state(model, q=jnp.asarray(q, model.mass.dtype),
                           v=jnp.asarray(v, model.mass.dtype))
            lcp, M, _, _, _ = prepare_constrained(model, s, None)
            probs.append((lcp, M))
        return probs

    def _residuals(self, model, probs):
        from diffdart_tpu.ops.lcp import _nat_residual
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank

        @jax.jit
        def solve_res(J, M, b, lo, hi, mu, fidx, A):
            lam = boxed_lcp_lowrank(
                J, M, jnp.asarray(model.contact_cfm, b.dtype), b, lo, hi, mu,
                fidx, model.contact_iters, 2, None, model.lcp_pivot_iters,
            )
            return _nat_residual(lam, A, b, lo, hi, mu, fidx)

        return [
            float(solve_res(l.J, M, l.b, l.lo, l.hi, l.mu, l.fidx, jnp.asarray(l.A)))
            for l, M in probs
        ]

    def test_capsule_lying_population(self):
        """Both caps on the ground: near-duplicate normal rows."""
        from diffdart_tpu.models import capsule_lying

        m = capsule_lying(dt=2e-3)
        q0 = np.array(m.neutral_q(), float)
        res = self._residuals(m, self._population(m, q0, 0.05, 0.044, 0.01))
        assert max(res) < 1e-5, f"stalled solves remain: {res}"

    def test_cube_coplanar_population(self):
        """4 coplanar corners: rank-3 normal block on a 6-dof body."""
        from diffdart_tpu.models import cube_drop

        m = cube_drop(dt=2e-3, friction=0.8)
        q0 = np.array(m.neutral_q(), float)
        res = self._residuals(m, self._population(m, q0, 0.04, 0.094, 0.01))
        assert max(res) < 1e-5, f"stalled solves remain: {res}"

    def test_duplicated_rows(self):
        """Literally duplicated constraint rows (J stacked twice)."""
        from diffdart_tpu.models import cube_drop
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.ops.lcp import _nat_residual
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank
        from diffdart_tpu.sim.constrained import prepare_constrained

        m = cube_drop(dt=2e-3, friction=0.8)
        q = np.array(m.neutral_q(), float)
        q[6] = 0.098
        s = make_state(m, q=jnp.asarray(q, m.mass.dtype))
        lcp, M, _, _, _ = prepare_constrained(m, s, None)
        D = lcp.J.shape[0]
        J2 = jnp.concatenate([lcp.J, lcp.J])
        b2 = jnp.concatenate([lcp.b, lcp.b])
        lo2 = jnp.concatenate([lcp.lo, lcp.lo])
        hi2 = jnp.concatenate([lcp.hi, lcp.hi])
        mu2 = jnp.concatenate([lcp.mu, lcp.mu])
        fidx2 = jnp.concatenate([lcp.fidx, jnp.where(lcp.fidx >= 0, lcp.fidx + D, -1)])
        cfm = jnp.asarray(m.contact_cfm, lcp.b.dtype)
        A2 = J2 @ jnp.linalg.solve(M, J2.T) + cfm * jnp.eye(2 * D, dtype=lcp.b.dtype)
        lam = boxed_lcp_lowrank(J2, M, cfm, b2, lo2, hi2, mu2, fidx2, 4, 2, None, 24)
        r = float(_nat_residual(lam, A2, b2, lo2, hi2, mu2, fidx2))
        assert r < 1e-5, f"duplicated-row LCP stalled: residual {r}"

    def test_refine_never_worse(self):
        """pivot_refine returns the best-by-residual iterate: on easy
        problems it must not degrade the polish result."""
        from diffdart_tpu.models import cube_drop
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.ops.lcp import _nat_residual
        from diffdart_tpu.ops.lcp_lowrank import boxed_lcp_lowrank
        from diffdart_tpu.sim.constrained import prepare_constrained

        m = cube_drop(dt=2e-3, friction=0.8)
        q = np.array(m.neutral_q(), float)
        q[6] = 0.09
        s = make_state(m, q=jnp.asarray(q, m.mass.dtype),
                       v=jnp.asarray(np.r_[0, 0, 0, 1.0, 0, -0.5], m.mass.dtype))
        lcp, M, _, _, _ = prepare_constrained(m, s, None)
        cfm = jnp.asarray(m.contact_cfm, lcp.b.dtype)
        base = boxed_lcp_lowrank(lcp.J, M, cfm, lcp.b, lcp.lo, lcp.hi,
                                 lcp.mu, lcp.fidx, 4, 2, None, 0)
        ref = boxed_lcp_lowrank(lcp.J, M, cfm, lcp.b, lcp.lo, lcp.hi,
                                lcp.mu, lcp.fidx, 4, 2, None, 16)
        A = jnp.asarray(lcp.A)
        r_base = float(_nat_residual(base, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx))
        r_ref = float(_nat_residual(ref, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx))
        assert r_ref <= r_base + 1e-12

    def test_solver_diagnostics_surface(self):
        """solver_diagnostics: small on healthy states, vmappable."""
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.models import capsule_lying
        from diffdart_tpu.sim import solver_diagnostics

        m = capsule_lying(dt=2e-3)
        qs = []
        for h in (0.044, 0.048, 0.052):
            q = np.array(m.neutral_q(), float)
            q[6] = h
            qs.append(q)
        from diffdart_tpu.dynamics.model import State

        batch = State(
            q=jnp.asarray(np.stack(qs), m.mass.dtype),
            v=jnp.zeros((3, m.nv), m.mass.dtype),
            t=jnp.zeros(3, m.mass.dtype),
        )
        res = jax.jit(jax.vmap(lambda s: solver_diagnostics(m, s)))(batch)
        assert res.shape == (3,)
        assert float(jnp.max(res)) < 1e-5

    def test_gradients_still_flow_after_refine(self):
        """IFT gradient through the refined solve matches FD on a
        rank-deficient state (the refinement fixes the active set the IFT
        linearizes around)."""
        from diffdart_tpu.dynamics.model import make_state
        from diffdart_tpu.models import capsule_lying
        from diffdart_tpu.sim import step

        m = capsule_lying(dt=2e-3)
        q = np.array(m.neutral_q(), float)
        q[6] = 0.048

        def loss(vz):
            # slide at 1 m/s while impacting at vz: the post-step tangential
            # velocity depends on the normal impulse through the friction
            # cone — a nonzero, contact-coupled gradient wrt vz
            v = jnp.zeros(m.nv, m.mass.dtype).at[3].set(1.0).at[5].set(vz)
            s = make_state(m, q=jnp.asarray(q, m.mass.dtype), v=v)
            out = step(m, s)
            return out.v[3]

        at = jnp.asarray(-0.3, m.mass.dtype)
        g = float(jax.grad(loss)(at))
        eps = 1e-6
        fd = (float(loss(at + eps)) - float(loss(at - eps))) / (2 * eps)
        assert np.isfinite(g)
        assert abs(fd) > 1e-3, f"test ill-posed: fd {fd}"
        # rtol bounded by central-difference truncation at eps=1e-6
        np.testing.assert_allclose(g, fd, rtol=1e-3, atol=1e-8)
