"""Atlas-class humanoid (BASELINE config 5): structural sanity, contact drop,
PD-held standing, and per-step Jacobians."""
import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.dynamics import mass_matrix
from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models.humanoid import humanoid, humanoid_init_q
from diffdart_tpu.sim import rollout


class TestHumanoid:
    def test_structure(self):
        m = humanoid()
        assert m.nv == 30, f"expected 30 dofs, got {m.nv}"
        assert 70.0 < float(jnp.sum(m.mass)) < 95.0
        M = np.asarray(mass_matrix(m, humanoid_init_q(m)))
        assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_drop_is_stable_numerically(self):
        """Uncontrolled humanoid dropped just above ground: must stay finite
        and land (no solver explosion) over 400 steps."""
        m = humanoid(dt=2e-3)
        s = make_state(m, q=humanoid_init_q(m))
        final, traj = jax.jit(rollout)(m, s, jnp.zeros((400, m.nv)))
        assert bool(jnp.all(jnp.isfinite(final.q)))
        assert bool(jnp.all(jnp.isfinite(final.v)))
        root_z = np.asarray(traj.q[:, 6])
        assert root_z.min() > 0.2  # lands on limbs, never tunnels through ground
        assert float(jnp.max(jnp.abs(final.v))) < 50.0

    def test_pd_hold_stands(self):
        """Strong joint PD (springs at the standing pose + damping) keeps the
        root high for 0.5 s — exercises springs, limits, and 8-corner foot
        contacts together."""
        m = humanoid(dt=2e-3)
        q0 = humanoid_init_q(m)
        stiff = jnp.full((m.nv,), 300.0).at[:6].set(0.0)
        m2 = m.replace(
            spring_stiff=stiff,
            damping=m.damping * 0.0 + jnp.full((m.nv,), 15.0).at[:6].set(0.0),
            has_springs=True,
        )
        s = make_state(m2, q=q0)
        final, traj = jax.jit(rollout)(m2, s, jnp.zeros((250, m.nv)))
        assert bool(jnp.all(jnp.isfinite(final.q)))
        assert float(final.q[6]) > 0.7, f"root fell to z={float(final.q[6])}"

    def test_timestep_jacobians_finite(self):
        from diffdart_tpu.neural import timestep_jacobians

        m = humanoid(dt=2e-3)
        s = make_state(m, q=humanoid_init_q(m))
        J = timestep_jacobians(m, s)
        for name in J._fields:
            arr = np.asarray(getattr(J, name))
            assert np.all(np.isfinite(arr)), f"{name} has non-finite entries"
        assert J.vel_vel.shape == (30, 30)
