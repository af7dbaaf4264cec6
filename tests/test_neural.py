"""Every analytical timestep Jacobian has a finite-difference twin — the
test_Gradients.cpp architecture (SURVEY.md §4: 'every-analytical-quantity-
has-an-FD-twin'), applied to the neural/ layer across contact-free,
in-contact, and sliding regimes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import State, make_state
from diffdart_tpu.models import cartpole, cube_drop, double_pendulum
from diffdart_tpu.neural import LossGradient, backprop, jacobian_wrt, timestep_jacobians
from diffdart_tpu.sim import step


def fd_jacobians(model, state, tau, eps=1e-6):
    """Central-difference twins of every analytical Jacobian (the reference's
    finiteDifferenceVelVelJacobian et al.)."""
    q, v = state.q, state.v
    base = step(model, state, tau)
    nv = model.nv

    # jit the probe: each FD column evaluates the full contact step, and the
    # eager (op-by-op) dispatch of the LCP pipeline dominated this file's
    # wall time (~10x) with identical numbers
    @jax.jit
    def _stepped(q_, v_, tau_):
        s = step(model, State(q=q_, v=v_, t=jnp.zeros(())), tau_)
        return D.position_difference(model, base.q, s.q), s.v

    def stepped(q_, v_, tau_):
        dq, v2 = _stepped(q_, v_, tau_)
        return np.asarray(dq), np.asarray(v2)

    def col(fn):
        cols_p, cols_v = [], []
        for i in range(nv):
            d = jnp.zeros(nv).at[i].set(eps)
            pp, vp = fn(d)
            pm, vm = fn(-d)
            cols_p.append((pp - pm) / (2 * eps))
            cols_v.append((vp - vm) / (2 * eps))
        return np.stack(cols_p, axis=1), np.stack(cols_v, axis=1)

    pos_pos, pos_vel = col(lambda d: stepped(D.integrate_positions(model, q, d, jnp.asarray(1.0, q.dtype)), v, tau))
    vel_pos, vel_vel = col(lambda d: stepped(q, v + d, tau))
    force_pos, force_vel = col(lambda d: stepped(q, v, tau + d))
    return dict(pos_pos=pos_pos, pos_vel=pos_vel, vel_pos=vel_pos, vel_vel=vel_vel,
                force_pos=force_pos, force_vel=force_vel)


def check_all(model, state, tau, atol=1e-6):
    J = timestep_jacobians(model, state, tau)
    F = fd_jacobians(model, state, tau)
    for name in F:
        np.testing.assert_allclose(
            np.asarray(getattr(J, name)), F[name], atol=atol,
            err_msg=f"Jacobian {name} mismatch vs FD twin",
        )


class TestContactFree:
    def test_double_pendulum(self):
        m = double_pendulum(dt=5e-3)
        s = make_state(m, q=jnp.array([0.4, -0.7]), v=jnp.array([1.0, -2.0]))
        check_all(m, s, jnp.array([0.3, -0.1]))

    def test_cartpole(self):
        m = cartpole(dt=5e-3)
        s = make_state(m, q=jnp.array([0.1, 0.5]), v=jnp.array([-0.3, 0.8]))
        check_all(m, s, jnp.array([0.5, 0.0]))


class TestWithContact:
    # Tolerance note: a resting/sliding contact sits AT the friction-cone
    # kink (lambda_t = 0, w_t = 0), where the LCP solution map is only
    # directionally differentiable. AD returns one valid subgradient while
    # central differences average the two one-sided derivatives, so a few
    # entries disagree by O(1e-4) absolute (entries are O(1)) — exactly the
    # phenomenon studied in the gradients-at-contact paper (PAPERS.md,
    # arXiv:2207.05060). Rollout-level gradients (test_contact.py) match FD
    # to 1e-5 relative because trajectories leave the measure-zero kink.
    def test_cube_resting(self):
        m = cube_drop(dt=2e-3, half=0.1, friction=0.6)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09995))
        check_all(m, s, jnp.zeros(6), atol=3e-4)

    def test_cube_sliding(self):
        m = cube_drop(dt=2e-3, half=0.1, friction=0.4)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09995), v=jnp.zeros(6).at[3].set(1.5))
        check_all(m, s, jnp.zeros(6), atol=3e-4)

    def test_mass_jacobian_fd_twin(self):
        m = cube_drop(dt=2e-3, half=0.1)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09995))
        J = timestep_jacobians(m, s, jnp.zeros(6))
        eps = 1e-6

        @jax.jit
        def v_of_mass(mass):
            return step(m.replace(mass=mass), s, jnp.zeros(6)).v

        for b in range(m.nbody):
            fd = (
                np.asarray(v_of_mass(m.mass.at[b].add(eps)))
                - np.asarray(v_of_mass(m.mass.at[b].add(-eps)))
            ) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J.mass_vel[b]), fd, atol=1e-5)


class TestBackprop:
    def test_backprop_matches_jacobian_transpose(self):
        m = cartpole(dt=5e-3)
        s = make_state(m, q=jnp.array([0.1, 0.5]), v=jnp.array([-0.3, 0.8]))
        tau = jnp.array([0.5, 0.0])
        J = timestep_jacobians(m, s, tau)
        gq_next = jnp.array([1.0, -2.0])
        gv_next = jnp.array([0.5, 3.0])
        out = backprop(m, s, tau, LossGradient(gq_next, gv_next, jnp.zeros(2)))
        np.testing.assert_allclose(
            np.asarray(out.wrt_position), np.asarray(J.pos_pos.T @ gq_next + J.pos_vel.T @ gv_next), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(out.wrt_velocity), np.asarray(J.vel_pos.T @ gq_next + J.vel_vel.T @ gv_next), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(out.wrt_torque), np.asarray(J.force_pos.T @ gq_next + J.force_vel.T @ gv_next), atol=1e-9
        )


class TestWrt:
    def test_wrt_variants_exist(self):
        m = cube_drop(dt=2e-3)
        s = make_state(m, q=m.neutral_q().at[6].set(0.09995))
        tau = jnp.zeros(6)
        for wrt in ["position", "velocity", "force", "group_masses", "group_coms", "group_inertias"]:
            out = jacobian_wrt(m, s, tau, wrt)
            assert all(np.all(np.isfinite(np.asarray(o))) for o in out)
