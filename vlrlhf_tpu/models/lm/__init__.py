from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params, lm_forward

__all__ = ["LMConfig", "init_lm_params", "lm_forward"]
