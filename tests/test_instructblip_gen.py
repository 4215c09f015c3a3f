"""InstructBLIP instruction-conditioned generation/eval (VERDICT r1 item 5b).

The reference's custom generate builds instruction-conditioned Q-Former query
embeds (/root/reference/src/vlrlhf/models/InstructBlip/__init__.py:76-160);
round 1's eval/_prompt_row and PPO prompt loop ran the Q-Former query-only.
These tests pin that qformer_input_ids flow from the prompt builder through
the collator into the engine's prefill, and that they actually condition the
features (logits change when the instruction changes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.data.collators import CollatorConfig
from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
from vlrlhf_tpu.data.tokenizer import ToyTokenizer
from vlrlhf_tpu.eval.harness import EvalRunner
from vlrlhf_tpu.generate.engine import GenerateConfig
from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.registry import FAMILIES, scale_down
from vlrlhf_tpu.models.vlm import init_vlm_params, vlm_forward


def _tiny_instructblip():
    cfg = scale_down(FAMILIES["instructblip"].make_config())
    tok = ToyTokenizer()
    qtok = ToyTokenizer(vocab_size=64)
    pcfg = ProcessorConfig(
        num_image_tokens=cfg.num_image_tokens,
        image_token="<image>",
        image_token_id=3,
        prefix_image_tokens=True,
        max_length=64,
        max_prompt_length=48,
    )
    proc = VLProcessor(
        tok, FAMILIES["instructblip"].template, pcfg, qformer_tokenizer=qtok
    )
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, proc


def _fake_loader(path, size, mode):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (size, size, 3), np.uint8)


def _runner(cfg, params, proc):
    return EvalRunner(
        model_cfg=cfg,
        params=params,
        processor=proc,
        gen_cfg=GenerateConfig(max_new_tokens=4, pad_token_id=0),
        collator_cfg=CollatorConfig(
            pad_token_id=0, bucket_multiple=32, image_size=cfg.vision.image_size
        ),
        image_loader=_fake_loader,
    )


def test_prompt_row_carries_qformer_ids():
    cfg, params, proc = _tiny_instructblip()
    runner = _runner(cfg, params, proc)
    row = runner._prompt_row("what color is the sky?", "img.jpg")
    assert "qformer_input_ids" in row and len(row["qformer_input_ids"]) > 0
    batch = runner._gen_collator([row])
    assert "qformer_input_ids" in batch and "qformer_mask" in batch
    assert batch["qformer_input_ids"].shape[0] == 1


def test_instruction_conditions_prefill_logits():
    """Same image + prompt ids, different Q-Former instruction => different
    merged features => different LM logits. Query-only (None) must also
    differ from instruction-conditioned."""
    cfg, params, proc = _tiny_instructblip()
    runner = _runner(cfg, params, proc)
    row = runner._prompt_row("describe the image", "img.jpg")
    batch = runner._gen_collator([row])

    def logits_for(qids, qmask):
        out, _ = vlm_forward(
            cfg,
            params,
            input_ids=jnp.asarray(batch["input_ids"]),
            pixel_values=jnp.asarray(batch["pixel_values"]),
            image_positions=jnp.asarray(batch["image_positions"]),
            qformer_ids=qids,
            qformer_mask=qmask,
            pad_mask=jnp.asarray(batch["pad_mask"]),
            ctx=Ctx(),
        )
        return np.asarray(out, np.float32)

    with_instr = logits_for(
        jnp.asarray(batch["qformer_input_ids"]), jnp.asarray(batch["qformer_mask"])
    )
    other_ids = (jnp.asarray(batch["qformer_input_ids"]) + 7) % 64
    other = logits_for(other_ids, jnp.asarray(batch["qformer_mask"]))
    query_only = logits_for(None, None)
    assert not np.allclose(with_instr, other, atol=1e-6)
    assert not np.allclose(with_instr, query_only, atol=1e-6)


def test_engine_accepts_qformer_batch():
    """End-to-end: run_vqa on an instructblip runner (prefill gets the
    instruction ids without shape errors; decode proceeds)."""
    cfg, params, proc = _tiny_instructblip()
    runner = _runner(cfg, params, proc)
    rows = [
        {"question": "is there a cat?", "img": "a.jpg"},
        {"question": "what shape is it?", "img": "b.jpg"},
    ]
    out = runner.run_vqa(rows, batch_size=2)
    assert len(out) == 2 and all("response" in r for r in out)


def test_ppl_path_passes_qformer_ids():
    cfg, params, proc = _tiny_instructblip()
    runner = _runner(cfg, params, proc)
    rows = [{"question": "is it red?", "answer": "yes", "img": "a.jpg"}]
    out = runner.run_vqa_ppl(rows, batch_size=1)
    assert np.isfinite(out[0]["ppl"])
