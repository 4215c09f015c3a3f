"""vlrlhf_tpu — a TPU-native VLM preference-learning framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of TideDra/VL-RLHF
(reference mounted at /root/reference): a unified processor/collator/model
abstraction over heterogeneous vision-language models, preference-learning
trainers (SFT / DPO / DDPO / IPO / KTO-pair / RM / PPO), GSPMD sharding over
device meshes, and a multimodal benchmark eval harness.

Layer map (bottom-up):
  core/      mesh + sharding runtime (replaces accelerate + DeepSpeed ZeRO)
  ops/       Pallas/XLA kernels (replaces flash-attn + torchvision native ops)
  lora/      adapter system incl. adapter-toggled reference policy (replaces peft)
  models/    functional Flax-free model stack behind a VLMFamily registry
             (replaces the reference's ModelCoreMapper plugins,
              /root/reference/src/vlrlhf/models/utils.py:18-31)
  data/      chat templates, processors, collators, dataset builders
  train/     loss family + jitted train steps + checkpointing
  generate/  bucketed prefill/decode engine (replaces HF generate + sglang)
  eval/      MME/MMBench/SEEDBench/MMVet/MMMU/MathVista/POPE/VQA harness
  cli/       vlrlhf dpo|sft|rm|ppo|eval|merge entry points
"""

__version__ = "0.1.0"
