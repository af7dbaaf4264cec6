from diffdart_tpu.models.basic import (  # noqa: F401
    pendulum,
    double_pendulum,
    cartpole,
    chain,
    projectile,
    capsule_lying,
    cube_drop,
)
from diffdart_tpu.models.half_cheetah import half_cheetah, cheetah_init_q  # noqa: F401
from diffdart_tpu.models.scenes import catapult, catapult_init_q, jump_worm  # noqa: F401
