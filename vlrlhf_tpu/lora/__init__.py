from vlrlhf_tpu.lora.lora import (
    LoraConfig,
    init_lora,
    lora_delta,
    merge_lora,
    match_lora_targets,
)

__all__ = [
    "LoraConfig",
    "init_lora",
    "lora_delta",
    "merge_lora",
    "match_lora_targets",
]
