"""DART-style World/Skeleton facade over the functional core.

Capability parity with dart::simulation::World + dart::dynamics::Skeleton's
state API (World::step/setTimeStep/getNumSkeletons, Skeleton::setPositions/
getPositions/setVelocities/getVelocities/getMassMatrix/getCoriolisForces/
computeForwardDynamics — SURVEY.md §2.1 and the pybind surface §2.3): the
north star requires DART's scene/state ergonomics on top of the pure
`step(model, state)` core. A World owns one fused SoA Model (all skeletons
merged — one jitted program per world archetype) plus the current immutable
State; Skeleton objects are dof-range views. Method names keep DART's
camelCase so reference users can switch with minimal edits.

The object layer is a thin veneer: anything performance-critical should use
the functional API (vmap/scan over `diffdart_tpu.sim.step`) directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics import dynamics as D
from diffdart_tpu.dynamics.model import Model, ModelBuilder, State, make_state
from diffdart_tpu.sim.step import step as _step_fn


class Skeleton:
    """A dof/body-range view into its World's fused model."""

    def __init__(self, world: "World", name: str, body_range, q_range, v_range):
        self._world = world
        self._name = name
        self._bodies = body_range  # (start, stop) body indices
        self._q = q_range
        self._v = v_range

    # -- identity ----------------------------------------------------------
    def getName(self) -> str:
        return self._name

    def getNumBodyNodes(self) -> int:
        return self._bodies[1] - self._bodies[0]

    def getNumDofs(self) -> int:
        return self._v[1] - self._v[0]

    # -- state -------------------------------------------------------------
    def getPositions(self):
        self._world._finalize()
        return self._world.state.q[self._q[0] : self._q[1]]

    def setPositions(self, q):
        self._world._finalize()
        s = self._world.state
        self._world.state = s.replace(q=s.q.at[self._q[0] : self._q[1]].set(jnp.asarray(q, s.q.dtype)))

    def getVelocities(self):
        self._world._finalize()
        return self._world.state.v[self._v[0] : self._v[1]]

    def setVelocities(self, v):
        self._world._finalize()
        s = self._world.state
        self._world.state = s.replace(v=s.v.at[self._v[0] : self._v[1]].set(jnp.asarray(v, s.v.dtype)))

    def getControlForces(self):
        self._world._finalize()
        return self._world._tau[self._v[0] : self._v[1]]

    def setControlForces(self, tau):
        w = self._world
        w._finalize()
        w._tau = w._tau.at[self._v[0] : self._v[1]].set(jnp.asarray(tau, w._tau.dtype))

    # -- dynamics queries ---------------------------------------------------
    def getMassMatrix(self):
        m, s = self._world.model, self._world.state
        M = D.mass_matrix(m, s.q)
        return M[self._v[0] : self._v[1], self._v[0] : self._v[1]]

    def getCoriolisAndGravityForces(self):
        m, s = self._world.model, self._world.state
        return D.bias_forces(m, s.q, s.v)[self._v[0] : self._v[1]]

    def computeForwardDynamics(self):
        m, s = self._world.model, self._world.state
        return D.forward_dynamics(m, s.q, s.v, self._world._tau)[self._v[0] : self._v[1]]

    def getCOM(self):
        from diffdart_tpu.dynamics import kinematics as K

        m, s = self._world.model, self._world.state
        R, p = K.fk(m, s.q)
        b0, b1 = self._bodies
        mass = m.mass[b0:b1]
        coms = K.com_positions(m, R, p)[b0:b1]
        return jnp.einsum("b,bi->i", mass, coms) / jnp.sum(mass)


class World:
    """Mutable-facade world. Build skeletons (via builders or loaders), then
    `step()`; the first step finalizes the fused Model and jits."""

    def __init__(self, gravity=(0, 0, -9.81), time_step=1e-3):
        self._builder = ModelBuilder(gravity=gravity, dt=time_step)
        self._skeletons: list[Skeleton] = []
        self._model: Model | None = None
        self.state: State | None = None
        self._tau = None
        self._time = 0.0
        self._jit_step = None

    # -- scene construction -------------------------------------------------
    def addSkeleton(self, build_fn, name: str | None = None) -> Skeleton:
        """build_fn(builder) adds bodies/geoms for one skeleton and returns
        nothing; the dof range it created becomes the Skeleton view."""
        if self._model is not None:
            raise RuntimeError("cannot add skeletons after the world is finalized")
        b = self._builder
        b0 = len(b.bodies)
        q0 = _total_nq(b)
        v0 = _total_nv(b)
        build_fn(b)
        name = name or f"skeleton{len(self._skeletons)}"
        sk = Skeleton(self, name, (b0, len(b.bodies)), (q0, _total_nq(b)), (v0, _total_nv(b)))
        self._skeletons.append(sk)
        return sk

    def loadSkeleton(self, path: str, name: str | None = None, **kw) -> Skeleton:
        """Load a URDF (.urdf) or SKEL (.skel) file as a new skeleton
        (DartLoader::parseSkeleton / SkelParser parity)."""
        from diffdart_tpu.io import load_into_builder

        return self.addSkeleton(lambda b: load_into_builder(b, path, **kw), name=name)

    # -- finalize / access ---------------------------------------------------
    def _finalize(self):
        if self._model is None:
            self._model = self._builder.finalize()
            self.state = make_state(self._model)
            self._tau = jnp.zeros(self._model.nv, self._model.mass.dtype)
            self._jit_step = jax.jit(lambda s, tau: _step_fn(self._model, s, tau))

    @property
    def model(self) -> Model:
        self._finalize()
        return self._model

    def getNumSkeletons(self) -> int:
        return len(self._skeletons)

    def getSkeleton(self, i) -> Skeleton:
        if isinstance(i, str):
            return next(s for s in self._skeletons if s.getName() == i)
        return self._skeletons[i]

    # -- sim loop ------------------------------------------------------------
    def setTimeStep(self, dt: float):
        if self._model is None:
            self._builder.dt = dt
        else:
            self._model = self._model.replace(dt=jnp.asarray(dt, self._model.dt.dtype))
            self._jit_step = jax.jit(lambda s, tau: _step_fn(self._model, s, tau))

    def getTimeStep(self) -> float:
        return float(self._builder.dt if self._model is None else self._model.dt)

    def getTime(self) -> float:
        return float(self.state.t) if self.state is not None else 0.0

    def step(self, reset_command: bool = True):
        """One timestep (World::step parity; resetCommand clears forces)."""
        self._finalize()
        self.state = self._jit_step(self.state, self._tau)
        if reset_command:
            self._tau = jnp.zeros_like(self._tau)

    def getState(self) -> State:
        self._finalize()
        return self.state

    def setState(self, state: State):
        self._finalize()
        self.state = state

    def getPositions(self):
        return self.getState().q

    def setPositions(self, q):
        self._finalize()
        self.state = self.state.replace(q=jnp.asarray(q, self.state.q.dtype))

    def getVelocities(self):
        return self.getState().v

    def setVelocities(self, v):
        self._finalize()
        self.state = self.state.replace(v=jnp.asarray(v, self.state.v.dtype))


def _nq(jtype):
    from diffdart_tpu.dynamics.model import JointType

    return JointType.DOF[jtype][0]


def _total_nq(builder: ModelBuilder) -> int:
    from diffdart_tpu.dynamics.model import JointType

    return sum(JointType.DOF[b.jtype][0] for b in builder.bodies)


def _total_nv(builder: ModelBuilder) -> int:
    from diffdart_tpu.dynamics.model import JointType

    return sum(JointType.DOF[b.jtype][1] for b in builder.bodies)
