from diffdart_tpu.dynamics.model import Model, State, ModelBuilder, JointType  # noqa: F401
from diffdart_tpu.dynamics.kinematics import fk, world_jacobian, body_velocities  # noqa: F401
from diffdart_tpu.dynamics.dynamics import (  # noqa: F401
    mass_matrix,
    bias_forces,
    forward_dynamics,
    inverse_dynamics,
    integrate_positions,
    position_difference,
)
