from diffdart_tpu.trajectory.ilqr import ilqr, ILQRResult  # noqa: F401
from diffdart_tpu.trajectory.shooting import (  # noqa: F401
    MultipleShooting,
    single_shooting,
    ShootingResult,
)
