"""Many-contact scenes: grouped/vmapped narrowphase + cube stacks.

The reference handles many-contact worlds with broadphase + constraint
islands (ConstraintSolver::updateConstraints); here pair pruning is static
and same-type pairs run as ONE vmapped narrowphase call (collide._grouped_plan),
so an n-cube stack traces O(1) kernels instead of O(n²)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.collision.collide import _grouped_plan, contact_slots, max_contacts
from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout


def _stacked_state(m, n, half, gap=1e-3):
    q = np.array(m.neutral_q())
    for i in range(n):
        q[7 * i] = 1.0  # quat w
        q[7 * i + 6] = half + i * (2 * half + gap)  # z
        # tiny lateral jitter so symmetry doesn't hide bugs
        q[7 * i + 4] = 0.002 * ((i % 3) - 1)
    return make_state(m, q=jnp.asarray(q, m.mass.dtype))


class TestStack:
    def test_grouping_collapses_pairs(self):
        m = cube_drop(n_cubes=10, dt=2e-3)
        groups = _grouped_plan(m)
        # 10 box-plane pairs + 45 box-box pairs -> exactly 2 vmapped groups
        assert len(groups) == 2
        sizes = sorted(len(g[3]) for g in groups)
        assert sizes == [10, 45]
        assert max_contacts(m) == 8 * 55
        ba, bb = contact_slots(m)
        assert len(ba) == 8 * 55

    def test_five_cube_stack_settles(self):
        half = 0.1
        m = cube_drop(n_cubes=5, dt=2e-3, half=half, friction=0.9)
        s = _stacked_state(m, 5, half)
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((300, m.nv)))
        assert bool(jnp.all(jnp.isfinite(final.q)))
        for i in range(5):
            z = float(final.q[7 * i + 6])
            expect = half + i * 2 * half
            assert abs(z - expect) < 0.02, f"cube {i} at z={z}, expected ~{expect}"
        # nothing slid off sideways
        for i in range(5):
            assert abs(float(final.q[7 * i + 4])) < 0.05

    def test_contact_budget_matches_full_solve(self):
        """With a budget >= the number of truly active slots, the top-K
        gathered LCP must reproduce the full-LCP trajectory (broadphase/
        islands replacement: pruning inactive slots is exact)."""
        half = 0.1
        m_full = cube_drop(n_cubes=5, dt=2e-3, half=half, friction=0.9)
        assert max_contacts(m_full) == 8 * 15
        m_bud = m_full.replace(contact_budget=48)
        from diffdart_tpu.collision.collide import effective_contacts

        assert effective_contacts(m_bud) == 48
        s = _stacked_state(m_full, 5, half)
        taus = jnp.zeros((150, m_full.nv))
        f_full, _ = jax.jit(rollout)(m_full, s, taus)
        f_bud, _ = jax.jit(rollout)(m_bud, s, taus)
        assert bool(jnp.all(jnp.isfinite(f_bud.q)))
        np.testing.assert_allclose(np.array(f_bud.q), np.array(f_full.q), atol=5e-3)

        # gradients flow through the gather
        def loss(v0):
            ss = State(q=s.q, v=s.v + v0, t=s.t)
            f, _ = rollout(m_bud, ss, jnp.zeros((20, m_bud.nv)))
            return jnp.sum(f.q**2)

        g = jax.jit(jax.grad(loss))(jnp.zeros(m_bud.nv))
        assert bool(jnp.all(jnp.isfinite(g)))

    @pytest.mark.slow
    def test_ten_cube_pyramid_is_finite_and_grounded(self):
        """10 cubes in free fall onto the plane: everything lands, nothing
        tunnels or explodes (many simultaneous box-box contacts). Slow tier:
        the 45-pair LCP compiles for minutes on the 1-vCPU CI box, and the
        5-cube stack + budget tests gate the same box-box semantics."""
        half = 0.08
        m = cube_drop(n_cubes=10, dt=2e-3, half=half, friction=0.8)
        q = np.array(m.neutral_q())
        rng = np.random.RandomState(0)
        for i in range(10):
            q[7 * i] = 1.0
            q[7 * i + 4] = 0.5 * rng.uniform(-1, 1)
            q[7 * i + 5] = 0.5 * rng.uniform(-1, 1)
            q[7 * i + 6] = 0.3 + 0.25 * i
        s = make_state(m, q=jnp.asarray(q, m.mass.dtype))
        final, _ = jax.jit(rollout)(m, s, jnp.zeros((400, m.nv)))
        assert bool(jnp.all(jnp.isfinite(final.q)))
        for i in range(10):
            z = float(final.q[7 * i + 6])
            assert half - 0.03 < z < 2.0, f"cube {i} ended at z={z}"
