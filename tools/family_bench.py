"""Per-family 7B DPO training matrix on the attached chip.

Measures every reference family's 7B-class geometry with the fastest
known-fitting config on a 16 GiB v5e (wide int8 QLoRA, 1 pair/step,
precomputed ref logps; remat policy per family as swept in ROADMAP.md).

Measured 2026-08-17 on one v5e:
  llava              2.10 pairs/s  59.2% MFU  (acts)
  llava_next_mistral 2.06 pairs/s  62.5% MFU  (acts; GQA)
  instructblip       1.94 pairs/s  54.9% MFU  (acts)
  qwen_vl            1.69 pairs/s  54.0% MFU  (mlp1; 9.66B params)
  internlm_xc2       0.70 pairs/s  44.7% MFU  (attn; seq 2048, built-in
                                               PLoRA riding)

Usage: python tools/family_bench.py [--bits4] [family ...]
  --bits4: int4 frozen base (ops/int4.py) instead of int8 — quarter param
  HBM buys more pairs/remat; measures the training-throughput tradeoff of
  the Pallas dequant-matmul forward + custom-VJP backward.
"""
import dataclasses
import sys

sys.path.insert(0, ".")
import jax

import bench
from vlrlhf_tpu.models.registry import FAMILIES
from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

# (remat_policy, seq, with_plora, anyres_px): fastest fitting config per
# family. llava_next_* bench at the REAL anyres geometry — a 672px image
# packs base + 2x2 tiles + newlines = 2928 image tokens (seq 3072), the
# shape the reference trains at (models/LlavaNext/__init__.py:213-232);
# round 2 ran them at a single-tile 576-token shape (VERDICT weak #2).
CONFIGS = {
    "llava": ("acts", 1024, False, 0),
    "llava_next_vicuna": ("attn", 3072, False, 672),
    "llava_next_mistral": ("attn", 3072, False, 672),
    "instructblip": ("acts", 1024, False, 0),
    "qwen_vl": ("mlp1", 1024, False, 0),
    # XC2's 1225 image tokens need seq 2048; its checkpoint-built-in trained
    # PLoRA (~590M params) rides at image positions in every forward
    "internlm_xc2": ("attn", 2048, True, 0),
}


def main(families):
    assert jax.default_backend() == "tpu"
    bits = 8
    if "--bits4" in families:
        families = [f for f in families if f != "--bits4"]
        bits = 4
    families = families or list(CONFIGS)
    bench._compile_cache()
    for fam in families:
        policy, seq, plora, anyres_px = CONFIGS[fam]
        cfg = FAMILIES[fam].make_config()
        cfg = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, remat_policy=policy)
        )
        try:
            pps, ms, mfu, pb = bench._measure_dpo(
                cfg, n_pairs=1, seq=seq, n_steps=5, n_warmup=2,
                precompute_ref=True, quantize=True,
                quant_patterns=TRAIN_QUANT_PATTERNS_WIDE, with_plora=plora,
                anyres_px=anyres_px, bits=bits,
            )
            tag = f", anyres {anyres_px}px" if anyres_px else ""
            print(f"{fam:20s} {pps:5.2f} pairs/s  {mfu*100:4.1f}% MFU  "
                  f"{ms:6.0f} ms/step  ({pb:.2f}B, {policy}, seq {seq}{tag})")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{fam:20s} FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main(sys.argv[1:])
