from vlrlhf_tpu.ops.norms import rms_norm, layer_norm
from vlrlhf_tpu.ops.rope import (
    RopeConfig,
    rope_frequencies,
    apply_rope,
)
from vlrlhf_tpu.ops.attention import multi_head_attention, make_attention_mask

__all__ = [
    "rms_norm",
    "layer_norm",
    "RopeConfig",
    "rope_frequencies",
    "apply_rope",
    "multi_head_attention",
    "make_attention_mask",
]
