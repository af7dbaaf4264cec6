"""diffdart_tpu: a TPU-native differentiable rigid-body physics framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
DiffDART/nimblephysics (reference: Ericcsr/diffdart — see SURVEY.md):
Featherstone-class articulated dynamics as batched structure-of-arrays ops,
frictional contact via a batched boxed-LCP solve with implicit-function-theorem
gradients, differentiable collision, URDF/SKEL loading, a DART-style
World/Skeleton API, and trajectory optimization as jitted scans.

Conventions (used everywhere):
  * spatial vectors are shape (..., 6), ANGULAR-FIRST: motion V = (omega, v),
    force F = (torque, force)
  * world-frame spatial quantities are expressed in Plucker coordinates at the
    WORLD ORIGIN
  * quaternions are (w, x, y, z)
  * transforms are (R, p) pairs: x_world = R @ x_body + p
"""

__version__ = "0.1.0"
