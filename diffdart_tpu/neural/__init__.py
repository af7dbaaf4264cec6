from diffdart_tpu.neural.jacobians import (  # noqa: F401
    TimestepJacobians,
    LossGradient,
    timestep_jacobians,
    backprop,
    jacobian_wrt,
)
from diffdart_tpu.neural.mappings import (  # noqa: F401
    HierarchicalIK,
    IKMapping,
    IdentityMapping,
    solve_ik,
)
