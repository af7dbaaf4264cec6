from diffdart_tpu.neural.jacobians import (  # noqa: F401
    TimestepJacobians,
    LossGradient,
    timestep_jacobians,
    backprop,
    jacobian_wrt,
)
from diffdart_tpu.neural.mappings import IKMapping, IdentityMapping, solve_ik  # noqa: F401
