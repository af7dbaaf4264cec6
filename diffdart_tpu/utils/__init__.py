from diffdart_tpu.utils.profile import Stopwatch, PerformanceLog, MetricsLogger  # noqa: F401
from diffdart_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
