"""Torch autograd bridge: gradients through the JAX step must match torch FD
(dart_torch.timestep parity)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from diffdart_tpu.models import cartpole, cube_drop
from diffdart_tpu.torch_bridge import timestep


class TestTorchBridge:
    def test_forward_matches_jax(self):
        from diffdart_tpu.dynamics.model import State
        from diffdart_tpu.sim import step

        m = cartpole(dt=5e-3)
        q = torch.tensor([0.1, 0.4], dtype=torch.float64)
        v = torch.tensor([-0.2, 0.8], dtype=torch.float64)
        tau = torch.tensor([0.5, 0.0], dtype=torch.float64)
        qn, vn = timestep(m, q, v, tau)
        s = step(m, State(q=jnp.array([0.1, 0.4]), v=jnp.array([-0.2, 0.8]), t=jnp.zeros(())), jnp.array([0.5, 0.0]))
        np.testing.assert_allclose(qn.numpy(), np.asarray(s.q), atol=1e-12)
        np.testing.assert_allclose(vn.numpy(), np.asarray(s.v), atol=1e-12)

    def test_multi_step_gradient(self):
        """Chain 20 torch steps with contact; loss.backward() gradient matches
        central differences."""
        m = cube_drop(dt=2e-3, half=0.1, friction=0.5)
        q0 = torch.tensor(np.asarray(m.neutral_q().at[6].set(0.105)), dtype=torch.float64)

        def run(vx):
            q = q0.clone()
            v = torch.zeros(6, dtype=torch.float64)
            v = v.clone()
            v[3] = vx if isinstance(vx, float) else 0.0
            if torch.is_tensor(vx):
                v = torch.cat([torch.zeros(3, dtype=torch.float64), vx.reshape(1),
                               torch.zeros(2, dtype=torch.float64)])
            tau = torch.zeros(6, dtype=torch.float64)
            for _ in range(20):
                q, v = timestep(m, q, v, tau)
            return q[4]

        vx = torch.tensor(1.0, dtype=torch.float64, requires_grad=True)
        out = run(vx)
        out.backward()
        g = float(vx.grad)
        eps = 1e-6
        fd = (float(run(1.0 + eps)) - float(run(1.0 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)
