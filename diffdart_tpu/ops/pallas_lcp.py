"""Pallas TPU kernel: fused phased-Jacobi LCP sweeps.

The XLA path re-reads the (B, D, D) constraint matrix from HBM on every sweep
(12+ passes of ~30 MB at B=4096, D=42). This kernel blocks over envs, loads
each A block into VMEM ONCE, and runs all sweep iterations on-chip — the
canonical fuse-the-iteration pattern from the TPU kernel playbook.

The friction-index coupling (bounds +-mu * lam[fidx]) uses a constant one-hot
selection matrix (fidx is static per model), so the gather becomes a small
matmul that Mosaic lowers cleanly.

Falls back to the pure-XLA `_jacobi` on non-TPU backends or if compilation
fails (interpret mode covers CPU tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(iters, A_ref, b_ref, lo_ref, hi_ref, mu_ref, isfr_ref, E_ref, lam_ref):
    A = A_ref[:]  # (BB, D, D)
    b = b_ref[:]  # (BB, D)
    lo = lo_ref[:]
    hi = hi_ref[:]
    mu = mu_ref[:]
    D = b.shape[-1]
    dtype = b.dtype
    is_fr = isfr_ref[0]  # (D,) friction-row indicator
    E = E_ref[:]  # (D, D) one-hot selector: row i -> lam[fidx[i]]

    diag = jnp.sum(A * jnp.eye(D, dtype=dtype)[None], axis=2)
    diag = jnp.maximum(diag, 1e-12)
    rowsum = jnp.maximum(jnp.sum(jnp.abs(A), axis=2), 1e-12)
    scale = jnp.clip(diag / rowsum, 0.3, 0.9) / diag  # (BB, D)

    def half_sweep(lam, fr_phase):
        # batched matvec as multiply+reduce: Mosaic does not lower batch-dim
        # dot_general, and operands are VMEM-resident so the VPU reduce is cheap
        r = jnp.sum(A * lam[:, None, :], axis=2) + b
        cand = lam - r * scale
        lam_n = jnp.sum(lam[:, None, :] * E[None, :, :], axis=2)
        lo_eff = jnp.where(is_fr[None, :] > 0, -mu * lam_n, lo)
        hi_eff = jnp.where(is_fr[None, :] > 0, mu * lam_n, hi)
        cand = jnp.clip(cand, lo_eff, hi_eff)
        mask = is_fr[None, :] * fr_phase + (1.0 - is_fr)[None, :] * (1.0 - fr_phase)
        return jnp.where(mask > 0, cand, lam)

    def sweep(_, lam):
        # fori_loop bounds live temporaries (the fully unrolled version
        # overflowed scoped VMEM at 8 iterations)
        lam = half_sweep(lam, jnp.asarray(0.0, dtype))
        return half_sweep(lam, jnp.asarray(1.0, dtype))

    lam = jax.lax.fori_loop(0, iters, sweep, jnp.zeros_like(b))
    lam_ref[:] = lam


@functools.partial(jax.jit, static_argnames=("fidx", "iters", "interpret"))
def jacobi_sweeps_pallas(A, b, lo, hi, mu, fidx: tuple, iters: int = 6, interpret: bool = False):
    """Batched fused sweeps. A: (B, D, D); b/lo/hi/mu: (B, D); fidx: static
    tuple of ints. Returns lam (B, D). hi may contain +inf (clamped in-kernel
    inputs must be finite: we substitute a large finite bound)."""
    B, D = b.shape
    dtype = b.dtype
    hi = jnp.where(jnp.isfinite(hi), hi, jnp.asarray(3.4e38, dtype))
    lo = jnp.where(jnp.isfinite(lo), lo, jnp.asarray(-3.4e38, dtype))

    # block envs so an A block + mul-reduce temporaries + double buffering fit
    # in 16M VMEM, accounting for last-dim padding to 128 lanes
    D_padded = max(D, 128)
    bb = max(8, min(B, (512 * 1024) // max(D * D_padded * 4, 1)))
    bb = 1 << (bb.bit_length() - 1)  # power of two
    bb = min(bb, B)
    pad = (-B) % bb
    if pad:
        A = jnp.concatenate([A, jnp.tile(jnp.eye(D, dtype=dtype)[None], (pad, 1, 1))], axis=0)
        zpad = jnp.zeros((pad, D), dtype)
        b = jnp.concatenate([b, zpad], axis=0)
        lo = jnp.concatenate([lo, zpad], axis=0)
        hi = jnp.concatenate([hi, zpad], axis=0)
        mu = jnp.concatenate([mu, zpad], axis=0)
    Bp = b.shape[0]

    fidx_np = np.asarray(fidx)
    is_fr = jnp.asarray((fidx_np >= 0).astype(np.float32), dtype)[None, :]  # (1, D)
    E_np = np.zeros((D, D), np.float32)
    for i, f in enumerate(fidx_np):
        if f >= 0:
            E_np[i, f] = 1.0
    E = jnp.asarray(E_np, dtype)

    kernel = functools.partial(_sweep_kernel, iters)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, D, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, D), dtype),
        interpret=interpret,
    )(A, b, lo, hi, mu, is_fr, E)
    return out[:B]


# ---------------------------------------------------------------------------
# single-env variant: composes with jax.vmap (the batching rule adds a grid
# dimension), so it drops into the vmapped constrained step directly
# ---------------------------------------------------------------------------


def _sweep_kernel1(iters, A_ref, b_ref, lo_ref, hi_ref, mu_ref, isfr_ref, E_ref, lam_ref):
    A = A_ref[:]  # (D, D)
    b = b_ref[:]  # (1, D)
    lo = lo_ref[:]
    hi = hi_ref[:]
    mu = mu_ref[:]
    D = A.shape[-1]
    dtype = b.dtype
    is_fr = isfr_ref[:]  # (1, D)
    E = E_ref[:]

    eye = jnp.eye(D, dtype=dtype)
    diag = jnp.maximum(jnp.sum(A * eye, axis=1, keepdims=True).T, 1e-12)  # (1, D)
    rowsum = jnp.maximum(jnp.sum(jnp.abs(A), axis=1, keepdims=True).T, 1e-12)
    scale = jnp.clip(diag / rowsum, 0.3, 0.9) / diag

    lam = jnp.zeros_like(b)
    for _ in range(iters):
        for phase_fr in (False, True):
            r = jax.lax.dot_general(
                lam, A,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype) + b
            cand = lam - r * scale
            lam_n = jax.lax.dot_general(
                lam, E,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            lo_eff = jnp.where(is_fr > 0, -mu * lam_n, lo)
            hi_eff = jnp.where(is_fr > 0, mu * lam_n, hi)
            cand = jnp.clip(cand, lo_eff, hi_eff)
            mask = is_fr if phase_fr else 1.0 - is_fr
            lam = jnp.where(mask > 0, cand, lam)
    lam_ref[:] = lam


def jacobi_sweeps_pallas_single(A, b, lo, hi, mu, fidx: tuple, iters: int = 6, interpret: bool = False):
    """Single-problem fused sweeps (vmap-compatible). A: (D, D); vectors (D,)."""
    D = b.shape[-1]
    dtype = b.dtype
    hi = jnp.where(jnp.isfinite(hi), hi, jnp.asarray(3.4e38, dtype))
    lo = jnp.where(jnp.isfinite(lo), lo, jnp.asarray(-3.4e38, dtype))
    fidx_np = np.asarray(fidx)
    is_fr = jnp.asarray((fidx_np >= 0).astype(np.float32), dtype)[None, :]
    E_np = np.zeros((D, D), np.float32)
    for i, f in enumerate(fidx_np):
        if f >= 0:
            E_np[i, f] = 1.0
    E = jnp.asarray(E_np, dtype)
    kernel = functools.partial(_sweep_kernel1, iters)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, D), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, b[None], lo[None], hi[None], mu[None], is_fr, E)
    return out[0]
