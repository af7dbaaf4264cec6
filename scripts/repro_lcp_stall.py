"""Repro for the rank-deficient LCP stall (VERDICT r2 missing #3).

Builds the known-bad configurations — capsule lying flat (both caps on the
ground), cube with 4 coplanar corners down, duplicated contact rows — and
compares the production jacobi+polish chain's natural-map residual against
the native Dantzig oracle on the same (A, b, lo, hi, mu, fidx) problems.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from diffdart_tpu.dynamics.model import GeomType, JointType, ModelBuilder, make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.ops import native_lcp
from diffdart_tpu.ops.lcp import _jacobi, _nat_residual, _polish
from diffdart_tpu.ops.lcp_lowrank import _polish_lowrank
from diffdart_tpu.ops.smalllinalg import cholesky_small
from diffdart_tpu.sim.constrained import prepare_constrained


def capsule_flat(dt=2e-3, friction=0.8):
    b = ModelBuilder(dt=dt)
    i = b.add_body(parent=-1, jtype=JointType.FREE, mass=1.0,
                   inertia=np.diag([0.02, 0.02, 0.005]))
    # capsule axis along x (rot maps z->x) so it lies flat on the z=0 plane
    rot = np.array([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]])
    b.add_geom(i, GeomType.CAPSULE, size=(0.05, 0.2, 0.0), rot=rot,
               friction=friction)
    b.add_geom(-1, GeomType.PLANE, friction=friction)
    return b.finalize()


def lcp_from(model, q, v):
    s = make_state(model, q=jnp.asarray(q, model.mass.dtype),
                   v=jnp.asarray(v, model.mass.dtype))
    lcp, M, Minv, v_star, dt = prepare_constrained(model, s, None)
    return lcp, M


def chain_residual(lcp, M, iters=4, passes=3):
    A = jnp.asarray(lcp.A)
    lam0 = _jacobi(A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx, iters)
    L_M = cholesky_small(M)
    lam = _polish_lowrank(lam0, lcp.J, L_M, 1e-6, A, lcp.b, lcp.lo, lcp.hi,
                          lcp.mu, lcp.fidx, passes=passes)
    return float(_nat_residual(lam, A, lcp.b, lcp.lo, lcp.hi, lcp.mu, lcp.fidx)), lam


def dantzig_residual(lcp):
    A = np.asarray(lcp.A, np.float64)
    lam, _w, status = native_lcp.boxed_lcp_dantzig(
        A, np.asarray(lcp.b, np.float64), np.asarray(lcp.lo, np.float64),
        np.asarray(lcp.hi, np.float64), np.asarray(lcp.mu, np.float64),
        np.asarray(lcp.fidx, np.int32))
    r = float(_nat_residual(jnp.asarray(lam), jnp.asarray(A), lcp.b, lcp.lo,
                            lcp.hi, lcp.mu, lcp.fidx))
    return r, lam


def run_case(name, model, q, v):
    lcp, M = lcp_from(model, q, v)
    nvalid = int(np.sum(np.asarray(lcp.valid))) if hasattr(lcp, "valid") else -1
    r_ours, lam_ours = chain_residual(lcp, M)
    r_orc, lam_orc = dantzig_residual(lcp)
    print(f"{name:34s} D={lcp.A.shape[0]:3d} valid={nvalid:3d} "
          f"ours={r_ours:10.3e} dantzig={r_orc:10.3e}")
    return r_ours, r_orc


def main():
    rng = np.random.default_rng(0)

    m = capsule_flat()
    q0 = np.array(m.neutral_q(), float)
    q0[6] = 0.048  # slightly penetrating, flat
    run_case("capsule flat, resting", m, q0, np.zeros(m.nv))
    v = np.zeros(m.nv); v[3] = 1.0
    run_case("capsule flat, sliding", m, q0, v)
    v = np.zeros(m.nv); v[5] = -0.5
    run_case("capsule flat, impacting", m, q0, v)

    mc = cube_drop(dt=2e-3, friction=0.8)
    qc = np.array(mc.neutral_q(), float)
    qc[6] = 0.099  # 4 corners coplanar, slight penetration
    run_case("cube 4-corner resting", mc, qc, np.zeros(mc.nv))
    v = np.zeros(mc.nv); v[3] = 2.0
    run_case("cube 4-corner sliding", mc, qc, v)
    v = np.zeros(mc.nv); v[5] = -1.0
    run_case("cube 4-corner impacting", mc, qc, v)

    # random perturbed states (tilt + velocity noise), capsule and cube
    from diffdart_tpu.math.lie import quat_exp, quat_mul

    def tilt(q, scale):
        dq = np.asarray(quat_exp(jnp.asarray(rng.normal(size=3) * scale)))
        q = q.copy()
        q[:4] = np.asarray(quat_mul(jnp.asarray(q[:4]), jnp.asarray(dq)))
        return q

    bad = worst = 0
    for k in range(30):
        q = tilt(q0, 0.05)
        q[6] = 0.044 + 0.01 * rng.random()
        v = rng.normal(size=m.nv) * (2.0 if k % 2 else 0.3)
        ro, rd = run_case(f"capsule random {k}", m, q, v)
        bad += ro > 1e-5
        worst = max(worst, ro)
    for k in range(30):
        q = tilt(qc, 0.04)
        q[6] = 0.094 + 0.01 * rng.random()
        v = rng.normal(size=mc.nv) * (2.0 if k % 2 else 0.3)
        ro, rd = run_case(f"cube random {k}", mc, q, v)
        bad += ro > 1e-5
        worst = max(worst, ro)
    print(f"random states: {bad}/60 above 1e-5, worst {worst:.3e}")


if __name__ == "__main__":
    main()
