from vlrlhf_tpu.models.vision.vit import ViTConfig, init_vit_params, vit_forward

__all__ = ["ViTConfig", "init_vit_params", "vit_forward"]
