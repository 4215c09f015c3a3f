from vlrlhf_tpu.generate.engine import GenerateConfig, generate

__all__ = ["GenerateConfig", "generate"]
