"""rollout_fast auto-dispatch contract (r2 VERDICT weak #9 / missing #6):
the fused tile path bakes model params, so parameter gradients MUST route to
the vmap path, and every fallback must be loud about why."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdart_tpu.dynamics.model import State
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim import rollout_fast
import diffdart_tpu.sim.fast as fast_mod


def _batch(m, B):
    q0 = np.array(m.neutral_q(), float)
    q0[6] = 0.12
    return State(
        q=jnp.tile(jnp.asarray(q0, m.mass.dtype), (B, 1)),
        v=jnp.zeros((B, m.nv), m.mass.dtype),
        t=jnp.zeros(B, m.mass.dtype),
    )


def test_fallback_warns_on_bad_batch_size():
    m = cube_drop(dt=2e-3)
    s = _batch(m, 7)
    taus = jnp.zeros((2, 7, m.nv), m.mass.dtype)
    with pytest.warns(UserWarning, match="multiple of 1024"):
        out = rollout_fast(m, s, taus)
    assert out.q.shape == (7, m.nq)


def test_param_gradient_dispatches_to_vmap_and_matches_fd(monkeypatch):
    """grad wrt model mass through rollout_fast: must NOT take the fused
    path (which would silently return zero) and must match finite
    differences."""
    m = cube_drop(dt=2e-3)
    B, T = 2, 3
    s = _batch(m, B)
    taus = jnp.zeros((T, B, m.nv), m.mass.dtype)

    def forbid(*a, **k):
        raise AssertionError("fused path taken with traced model params")

    monkeypatch.setattr(fast_mod, "supports_fused", lambda model: forbid())

    def loss(mass):
        mm = m.replace(mass=mass)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            final = rollout_fast(mm, s, taus)
        return jnp.sum(final.v**2) + jnp.sum(final.q[:, 6] ** 2)

    g = jax.grad(loss)(m.mass)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-6
    e0 = jnp.zeros_like(m.mass).at[0].set(1.0)
    fd = (float(loss(m.mass + eps * e0)) - float(loss(m.mass - eps * e0))) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=5e-5, atol=1e-9)


def test_traced_params_reason_reported():
    m = cube_drop(dt=2e-3)
    B = 1024

    def f(mass):
        reason = fast_mod._fallback_reason(m.replace(mass=mass), B)
        assert reason is not None and "traced" in reason
        return jnp.sum(mass)

    jax.grad(f)(m.mass)
