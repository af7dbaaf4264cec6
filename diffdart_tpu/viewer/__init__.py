from diffdart_tpu.viewer.protocol import scene_description, state_frame, trajectory_frames  # noqa: F401
from diffdart_tpu.viewer.export import save_html  # noqa: F401
from diffdart_tpu.viewer.server import GUIWebsocketServer  # noqa: F401
