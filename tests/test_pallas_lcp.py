"""Pallas fused-sweep kernel vs the XLA reference sweeps (interpret mode on
CPU; the compiled path is exercised on TPU via contact_solver='lowrank_pallas')."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffdart_tpu.ops.lcp import _jacobi
from diffdart_tpu.ops.pallas_lcp import jacobi_sweeps_pallas, jacobi_sweeps_pallas_single


def _problems(B=16, ncon=3, nv=5, seed=0):
    rng = np.random.default_rng(seed)
    D = 3 * ncon
    J = rng.normal(size=(B, D, nv)).astype(np.float32)
    A = np.einsum("bik,bjk->bij", J, J) + 1e-3 * np.eye(D, dtype=np.float32)
    b = rng.normal(size=(B, D)).astype(np.float32)
    lo = np.zeros((B, D), np.float32)
    hi = np.concatenate([np.full((B, ncon), np.inf), np.zeros((B, 2 * ncon))], axis=1).astype(np.float32)
    mu = np.concatenate([np.zeros((B, ncon)), np.full((B, 2 * ncon), 0.5)], axis=1).astype(np.float32)
    fidx = tuple(int(x) for x in np.concatenate([np.full(ncon, -1), np.tile(np.arange(ncon), 2)]))
    return A, b, lo, hi, mu, fidx


def _xla_ref(A, b, lo, hi, mu, fidx, iters):
    fidx_j = jnp.asarray(np.array(fidx), jnp.int32)
    return jax.vmap(lambda A_, b_, lo_, hi_, mu_: _jacobi(A_, b_, lo_, hi_, mu_, fidx_j, iters))(
        jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(mu)
    )


class TestPallasKernel:
    def test_batched_kernel_matches_xla(self):
        A, b, lo, hi, mu, fidx = _problems()
        lam_p = jacobi_sweeps_pallas(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(mu), fidx, 6, interpret=True,
        )
        lam_ref = _xla_ref(A, b, lo, hi, mu, fidx, 6)
        np.testing.assert_allclose(np.asarray(lam_p), np.asarray(lam_ref), atol=1e-6)

    def test_single_env_kernel_under_vmap(self):
        A, b, lo, hi, mu, fidx = _problems(seed=3)
        f = jax.vmap(functools.partial(jacobi_sweeps_pallas_single, fidx=fidx, iters=6, interpret=True))
        lam_p = f(jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(mu))
        lam_ref = _xla_ref(A, b, lo, hi, mu, fidx, 6)
        np.testing.assert_allclose(np.asarray(lam_p), np.asarray(lam_ref), atol=1e-6)

    def test_batch_padding(self):
        """Non-power-of-two batch exercises the padding path."""
        A, b, lo, hi, mu, fidx = _problems(B=13, seed=5)
        lam_p = jacobi_sweeps_pallas(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(mu), fidx, 4, interpret=True,
        )
        lam_ref = _xla_ref(A, b, lo, hi, mu, fidx, 4)
        assert lam_p.shape == (13, 9)
        np.testing.assert_allclose(np.asarray(lam_p), np.asarray(lam_ref), atol=1e-6)
