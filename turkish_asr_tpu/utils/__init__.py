from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.utils.logger import get_logger

__all__ = ["get_config", "get_logger"]
