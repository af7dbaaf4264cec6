from diffdart_tpu.models.basic import (  # noqa: F401
    pendulum,
    double_pendulum,
    cartpole,
    chain,
    projectile,
    cube_drop,
)
