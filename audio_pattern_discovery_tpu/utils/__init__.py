from audio_pattern_discovery_tpu.utils.logging import get_logger, StageCounters  # noqa: F401
from audio_pattern_discovery_tpu.utils.timer import DeviceTimer  # noqa: F401
