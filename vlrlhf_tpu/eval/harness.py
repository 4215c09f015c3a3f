"""Eval harness core: batched generation + per-choice CE ranking on TPU.

Replaces /root/reference/src/vlrlhf/eval/utils.py:
  run_vqa     (:51-82)  -> EvalRunner.run_vqa: the TPU generation engine
                           decodes ONLY new tokens (no echo-stripping
                           heuristics needed), batches bucketed by prompt len.
  run_vqa_ppl (:85-120) -> EvalRunner.run_vqa_ppl: per-choice mean-CE ranking
                           in one jitted forward per bucket.
  run_vqa_sgl (:123-173)-> subsumed: the same engine IS the fast path (no
                           external sglang server; TP via the mesh).

Data-parallel eval over a mesh shards batches on (data, fsdp) exactly like
training; results gather on host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.data.collators import CollatorConfig, GenerationCollator, SFTCollator
from vlrlhf_tpu.data.processor import VLProcessor, make_single_turn_conv
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.models.vlm import VLMConfig, vlm_forward

PyTree = Any


@dataclasses.dataclass
class EvalRunner:
    model_cfg: VLMConfig
    params: PyTree
    processor: VLProcessor
    gen_cfg: GenerateConfig
    collator_cfg: CollatorConfig
    image_loader: Optional[Callable] = None
    adapters: Optional[PyTree] = None
    lora_scale: float = 1.0
    # slot-refill continuous batching for run_vqa (generate/continuous.py);
    # batch_size then sets the number of SLOTS
    continuous_batching: bool = False
    # >0: speculative decoding with this draft length. Static path:
    # generate/speculative.py host-driven prompt-lookup verify. Continuous
    # batching: device-resident speculative bursts
    # (generate/continuous._cb_spec_burst_impl). Greedy = identical tokens,
    # sampled = identical distribution via lossless rejection sampling;
    # fewer weight-stream passes either way.
    speculative_k: int = 0

    def __post_init__(self):
        if self.speculative_k > 0 and not self.continuous_batching:
            from vlrlhf_tpu.generate.speculative import SpeculativeGenerator

            self._gen = SpeculativeGenerator(
                self.model_cfg, self.gen_cfg, self.adapters,
                self.lora_scale, k_draft=self.speculative_k,
            )
        else:
            self._gen = Generator(
                self.model_cfg, self.gen_cfg, self.adapters, self.lora_scale
            )
        self._gen_collator = GenerationCollator(
            self.processor, self.collator_cfg, self.image_loader
        )
        self._sft_collator = SFTCollator(
            self.processor, self.collator_cfg, self.image_loader
        )
        self._ce_fn = None

    # ───────────── generation mode ─────────────

    def _prompt_row(self, question: str, img_path) -> dict:
        n_img = 0 if img_path is None else (
            len(img_path) if isinstance(img_path, list) else 1
        )
        prompt = self.processor.format_multimodal_prompt(question, n_img)
        conv = make_single_turn_conv(prompt, "")
        out = self.processor.process_conv(conv)
        ids = self.processor.maybe_prefix_image_ids(out["input_ids"], n_img)
        row = {"input_ids": ids, "img_path": img_path}
        if self.processor.qformer_tokenizer is not None:
            # InstructBLIP: the Q-Former is instruction-aware — generation
            # must condition it on the question (the reference's custom
            # generate, models/InstructBlip/__init__.py:76-160). Round 1 ran
            # it query-only here.
            row["qformer_input_ids"] = self.processor.qformer_ids(question)
        return row

    def _run_vqa_continuous(
        self, rows, prompt_key, image_key, n_slots, progress
    ) -> list[dict]:
        """Slot-refill serving (generate/continuous.py): mixed response
        lengths no longer straggle whole batches — the sglang-server role's
        core win, in-process."""
        from vlrlhf_tpu.generate.continuous import ContinuousEngine
        from vlrlhf_tpu.generate.server import RequestBuilder

        # ONE Request-construction path for the harness, the HTTP server,
        # and any other caller (generate/server.py RequestBuilder) — the
        # prompt templating / image-token expansion / anyres slicing must
        # not fork per consumer.
        builder = RequestBuilder(
            self.processor, self.collator_cfg, self.image_loader
        )
        reqs = [
            builder.build(r[prompt_key], r.get(image_key)) for r in rows
        ]
        cache_len = -(-(max(len(q.input_ids) for q in reqs)
                        + self.gen_cfg.max_new_tokens) // 128) * 128
        key = (n_slots, cache_len)
        if getattr(self, "_cb_engines", None) is None:
            self._cb_engines = {}
        if key not in self._cb_engines:
            self._cb_engines[key] = ContinuousEngine(
                self.model_cfg, self.gen_cfg, n_slots=n_slots,
                cache_len=cache_len, adapters=self.adapters,
                lora_scale=self.lora_scale,
                speculative_k=self.speculative_k,
            )
        outs = self._cb_engines[key].run(self.params, reqs, progress=progress)
        results = []
        for r, toks in zip(rows, outs):
            r = dict(r)
            r["response"] = self.processor.tokenizer.decode(
                list(toks), skip_special_tokens=True
            ).strip()
            results.append(r)
        return results

    def run_vqa(
        self,
        rows: Sequence[dict],
        batch_size: int = 16,
        prompt_key: str = "question",
        image_key: str = "img",
        progress: bool = False,
    ) -> list[dict]:
        """Each row gains a 'response' string; returns rows in order."""
        if self.continuous_batching:
            return self._run_vqa_continuous(
                rows, prompt_key, image_key, batch_size, progress
            )
        results = []
        it = range(0, len(rows), batch_size)
        if progress:
            from tqdm import tqdm

            it = tqdm(it, total=-(-len(rows) // batch_size))
        for start in it:
            chunk = list(rows[start : start + batch_size])
            prompt_rows = [
                self._prompt_row(r[prompt_key], r.get(image_key)) for r in chunk
            ]
            batch = self._gen_collator(prompt_rows)
            tokens = np.asarray(self._gen(self.params, batch))
            for r, toks in zip(chunk, tokens):
                toks = toks[toks != self.gen_cfg.pad_token_id]
                r = dict(r)
                r["response"] = self.processor.tokenizer.decode(
                    toks.tolist(), skip_special_tokens=True
                ).strip()
                results.append(r)
        return results

    # ───────────── log-likelihood mode ─────────────

    def _ce(self, batch: dict) -> np.ndarray:
        if self._ce_fn is None:
            cfg = self.model_cfg

            def ce(params, input_ids, labels, pad_mask, pixel_values,
                   image_positions, qformer_ids, qformer_mask):
                logits, _ = vlm_forward(
                    cfg,
                    params,
                    input_ids=input_ids,
                    pixel_values=pixel_values,
                    image_positions=image_positions,
                    qformer_ids=qformer_ids,
                    qformer_mask=qformer_mask,
                    pad_mask=pad_mask,
                )
                lg = logits[:, :-1].astype(jnp.float32)
                lb = labels[:, 1:]
                mask = lb != -100
                safe = jnp.where(mask, lb, 0)
                logps = jax.nn.log_softmax(lg, axis=-1)
                nll = -jnp.take_along_axis(
                    logps, safe[..., None], axis=-1, mode="clip"
                )[..., 0]
                return jnp.sum(nll * mask, -1) / jnp.maximum(mask.sum(-1), 1)

            self._ce_fn = jax.jit(ce)
        def opt(key):
            v = batch.get(key)
            return None if v is None else jnp.asarray(v)

        return np.asarray(
            self._ce_fn(
                self.params,
                jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["labels"]),
                jnp.asarray(batch["pad_mask"]),
                jnp.asarray(batch["pixel_values"]),
                jnp.asarray(batch["image_positions"]),
                opt("qformer_input_ids"),
                opt("qformer_mask"),
            )
        )

    def run_vqa_ppl(
        self,
        rows: Sequence[dict],
        batch_size: int = 16,
        prompt_key: str = "question",
        answer_key: str = "answer",
        image_key: str = "img",
        progress: bool = False,
    ) -> list[dict]:
        """Each row gains 'ppl' = mean CE of its answer tokens (the
        reference's per-choice ranking metric, eval/utils.py:85-120)."""
        results = []
        for start in range(0, len(rows), batch_size):
            chunk = list(rows[start : start + batch_size])
            tok_rows = [
                self.processor.tokenize_row_sft(
                    {
                        "prompt": r[prompt_key],
                        "answer": r[answer_key],
                        "img_path": r.get(image_key),
                    }
                )
                for r in chunk
            ]
            batch = self._sft_collator(tok_rows)
            ce = self._ce(batch)
            for r, c in zip(chunk, ce):
                r = dict(r)
                r["ppl"] = float(c)
                results.append(r)
        return results
