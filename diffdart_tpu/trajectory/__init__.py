from diffdart_tpu.trajectory.ilqr import ilqr, ILQRResult, make_dynamics, tangent_ops  # noqa: F401
from diffdart_tpu.trajectory.shooting import (  # noqa: F401
    MultipleShooting,
    single_shooting,
    ShootingResult,
)
from diffdart_tpu.trajectory.nlp import solve_slsqp, NLPInfo  # noqa: F401
