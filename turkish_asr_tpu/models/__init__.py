from turkish_asr_tpu.models.conformer import (
    ModelConfig,
    init_model,
    apply_model,
    count_params,
)
from turkish_asr_tpu.models.attention import (
    rope_cos_sin,
    rotate_half,
    apply_rope,
    mqa_attention,
    init_attention,
)

__all__ = [
    "ModelConfig",
    "init_model",
    "apply_model",
    "count_params",
    "rope_cos_sin",
    "rotate_half",
    "apply_rope",
    "mqa_attention",
    "init_attention",
]
