#!/usr/bin/env python
"""Web GUI streaming (dart/server parity): simulate cubes while a browser at
http://localhost:8070 watches live."""
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp

from diffdart_tpu.dynamics.model import make_state
from diffdart_tpu.models import cube_drop
from diffdart_tpu.sim.step import step
from diffdart_tpu.viewer import GUIWebsocketServer


def main():
    m = cube_drop(dt=2e-3, n_cubes=3, restitution=0.3)
    q0 = m.neutral_q()
    q0 = q0.at[6].set(0.5).at[13].set(0.9).at[20].set(1.3)
    q0 = q0.at[4].set(0.02).at[11].set(-0.03)  # slight offsets for tumbling
    s = make_state(m, q=q0)
    stepper = jax.jit(lambda st: step(m, st))

    srv = GUIWebsocketServer().serve(port=8070)
    print("viewer at http://localhost:8070 — Ctrl-C to stop")
    try:
        while True:
            for _ in range(5):
                s = stepper(s)
            srv.renderWorld(m, s.q, float(s.t))
            time.sleep(0.01)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
