"""VLProcessor: chat formatting, labeling, DPO/SFT row tokenization, and
image-placeholder expansion.

One template-driven implementation replaces the reference's five
near-duplicate processors (SURVEY.md §2.1). Two labeling styles:

  incremental — retokenize the growing conversation string; assistant-turn
    label tokens are taken from the tail of the standalone-tokenized answer
    (behavioral port of models/Llava/__init__.py:343-388, which all non-Qwen
    families share).
  chatml — token-level ChatML building for Qwen (models/QwenVL/__init__.py:
    92-189), producing separate prompt/answer/full streams.

DPO row tokenization follows TRL 0.8.1 DPOTrainer.tokenize_row semantics
byte-for-byte (merge-boundary handling in build_tokenized_answer, BOS/EOS
insertion, keep_end prompt truncation) as invoked by the reference's
VLDPOTrainer.tokenize_row (/root/reference/src/vlrlhf/base/trainer.py:105-122).

The TPU-critical extra: `expand_image_tokens` rewrites each single image
placeholder id into `num_image_tokens` copies at tokenize time and returns
the position map, so the device-side merge is a static-shape scatter
(models/common.py) instead of the reference's in-forward dynamic merge.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np

from vlrlhf_tpu.data.chat_templates import ChatTemplate

LABEL_PAD = -100


@dataclasses.dataclass(frozen=True)
class ProcessorConfig:
    num_image_tokens: int = 576
    image_token: str = "<image>"  # string form inside prompts
    image_token_id: int = 32000
    max_length: int = 1024
    max_prompt_length: int = 512
    truncation_mode: str = "keep_end"
    add_bos: bool = True
    # Qwen-style wrapped expansion: placeholder -> start + n*pad + end, with
    # features scattered onto the pad slots (the reference's image_start_id /
    # image_pad_id / image_end_id markers, models/QwenVL/tokenization_qwen.py;
    # the splice positions match modeling_qwen.py:620-625).
    image_start_id: Optional[int] = None
    image_end_id: Optional[int] = None
    image_pad_id: Optional[int] = None  # defaults to image_token_id
    # Prefix-embedding models (InstructBLIP): the prompt text has NO
    # placeholder; one image token is PREPENDED to the sequence (before BOS)
    # and expands to num_image_tokens, matching the reference's query-embeds
    # prepend (models/InstructBlip/__init__.py:32-74).
    prefix_image_tokens: bool = False


def make_single_turn_conv(prompt: str, answer: str = "") -> list[dict]:
    return [
        {"from": "user", "value": prompt},
        {"from": "assistant", "value": answer},
    ]


class VLProcessor:
    def __init__(
        self,
        tokenizer,
        template: ChatTemplate,
        cfg: ProcessorConfig,
        qformer_tokenizer=None,  # InstructBLIP's second tokenizer
    ):
        self.tokenizer = tokenizer
        self.template = template
        self.cfg = cfg
        self.qformer_tokenizer = qformer_tokenizer

    def qformer_ids(self, text: str, max_len: int = 512) -> list[int]:
        """Instruction ids for the Q-Former (the reference clamps to 512,
        models/InstructBlip/__init__.py:305-322)."""
        clean = text.replace(self.template.image_placeholder, "").replace(
            self.cfg.image_token, ""
        )
        return self.qformer_tokenizer.encode(clean, add_special_tokens=True)[
            :max_len
        ]

    def maybe_prefix_image_ids(self, input_ids: list, n_images: int) -> list:
        """Prefix-embedding models: prepend one placeholder per image (the
        generation/eval path analog of the tokenize_row prepend)."""
        if self.cfg.prefix_image_tokens and n_images:
            return [self.cfg.image_token_id] * n_images + list(input_ids)
        return list(input_ids)

    # ─────────── prompt formatting ───────────

    def format_multimodal_prompt(self, prompt: str, n_images: int = 1) -> str:
        ph = self.template.image_placeholder
        if n_images == 0:
            return prompt
        if self.cfg.image_start_id is not None:
            # Wrapped mode (Qwen-VL): reproduce the reference's surrounding
            # text exactly (QwenVLProcessor.format_multimodal_prompt,
            # models/QwenVL/__init__.py:192-206) — "Picture 1: <img>…</img>\n"
            # for a bare single-image prompt, "<img>…</img>\n" per "<image>"
            # otherwise. The reference embeds the image PATH between the
            # tags; those in-span ids are overwritten by visual features in
            # the forward, so a single placeholder token (expanded to the
            # same span length by expand_image_tokens) is logits-equivalent.
            # "<image>" markers in the raw prompt are generic (cfg.image_token
            # is the tokenizer-special surface form, e.g. "<imgpad>").
            if n_images == 1 and "<image>" not in prompt:
                return f"Picture 1: {self.cfg.image_token}\n{prompt}"
            assert prompt.count("<image>") == n_images, (
                f"{n_images} images but prompt has "
                f"{prompt.count('<image>')} placeholders"
            )
            return prompt.replace("<image>", f"{self.cfg.image_token}\n")
        if n_images == 1 and self.cfg.image_token not in prompt:
            return ph + prompt
        assert prompt.count(self.cfg.image_token) == n_images, (
            f"{n_images} images but prompt has "
            f"{prompt.count(self.cfg.image_token)} placeholders"
        )
        return prompt.replace(self.cfg.image_token, ph)

    # ─────────── conversation labeling ───────────

    def process_conv(
        self,
        conv: Sequence[dict],
        add_end_for_empty_value: bool = False,
    ) -> dict[str, Any]:
        """Returns {input_ids, labels, raw_str} for one conversation."""
        if self.template.style == "chatml":
            return self._process_conv_chatml(conv, add_end_for_empty_value)
        return self._process_conv_incremental(conv, add_end_for_empty_value)

    def _process_conv_incremental(self, conv, add_end_for_empty_value):
        t = self.template
        role_begin = {"user": t.user_begin, "assistant": t.assistant_begin}
        role_end = {"user": t.user_end, "assistant": t.assistant_end}
        raw = t.preamble
        labels: list[int] = []
        input_ids: list[int] = []
        prev_len = 0
        for idx, turn in enumerate(conv):
            begin, end = role_begin[turn["from"]], role_end[turn["from"]]
            value = turn["value"]
            raw += begin + value + (
                end if value != "" or add_end_for_empty_value else ""
            )
            text_tokens = self.tokenizer.encode(
                value, add_special_tokens=(idx == 0)
            )
            input_ids = self.tokenizer.encode(raw, add_special_tokens=True)
            extend_len = len(input_ids) - prev_len
            prev_len = len(input_ids)
            labels.extend([LABEL_PAD] * extend_len)
            if turn["from"] == "assistant" and len(text_tokens) != 0:
                target_len = min(extend_len, len(text_tokens), len(labels))
                if target_len > 0:
                    labels[-target_len:] = text_tokens[-target_len:]
        assert len(input_ids) == len(labels)
        return {"input_ids": input_ids, "labels": labels, "raw_str": raw}

    def _process_conv_chatml(self, conv, add_end_for_empty_value):
        """Qwen ChatML: <|im_start|>role\\n...<|im_end|>\\n token-level build."""
        tok = self.tokenizer
        im_start = tok.convert_token_to_id("<|im_start|>")
        im_end = tok.convert_token_to_id("<|im_end|>")
        nl = tok.encode("\n")
        system_msg = self.template.system_message
        # Label arithmetic is structural (pad everything between im_start and
        # im_end) — identical to the reference's len-3 form when "\n" is one
        # token (Qwen's tiktoken), robust for other tokenizers.
        system = (
            [im_start]
            + tok.encode("system")
            + nl
            + tok.encode(system_msg)
            + [im_end]
            + nl
        )
        input_ids = list(system)
        labels = (
            [im_start]
            + [LABEL_PAD] * (len(system) - 2 - len(nl))
            + [im_end]
            + nl
        )
        raw = f"<|im_start|>system\n{system_msg}<|im_end|>\n"
        prompt_ids: list[int] = []
        answer_ids: list[int] = []
        answer_labels: list[int] = []
        for turn in conv:
            role = "user" if turn["from"] == "user" else "assistant"
            role_ids = tok.encode(f"<|im_start|>{role}")
            value = turn["value"]
            turn_ids = role_ids + nl
            raw += f"<|im_start|>{role}\n"
            if value != "" or add_end_for_empty_value:
                turn_ids = turn_ids + tok.encode(value) + [im_end] + nl
                raw += f"{value}<|im_end|>\n"
            input_ids += turn_ids
            if role == "user":
                if value != "" or add_end_for_empty_value:
                    turn_labels = (
                        [im_start]
                        + [LABEL_PAD] * (len(turn_ids) - 2 - len(nl))
                        + [im_end]
                        + nl
                    )
                else:
                    turn_labels = [im_start] + [LABEL_PAD] * (
                        len(turn_ids) - 1
                    )
                prompt_ids = list(input_ids)
            else:
                if value != "" or add_end_for_empty_value:
                    value_ids = turn_ids[len(role_ids) + len(nl) : -(1 + len(nl))]
                    turn_labels = (
                        [im_start]
                        + [LABEL_PAD] * (len(role_ids) - 1 + len(nl))
                        + value_ids
                        + [im_end]
                        + nl
                    )
                else:
                    turn_labels = [im_start] + [LABEL_PAD] * (
                        len(turn_ids) - 1
                    )
                answer_ids += turn_ids
                answer_labels += turn_labels
            labels += turn_labels
        assert len(input_ids) == len(labels)
        return {
            "input_ids": input_ids,
            "labels": labels,
            "raw_str": raw,
            "prompt_ids": prompt_ids,
            "answer_ids": answer_ids,
            "answer_labels": answer_labels,
        }

    # ─────────── DPO row tokenization (TRL 0.8.1 semantics) ───────────

    def _build_tokenized_answer(self, prompt: str, answer: str):
        tok = self.tokenizer
        full = tok.encode(prompt + answer, add_special_tokens=False)
        prompt_ids = tok.encode(prompt, add_special_tokens=False)
        if len(full) < len(prompt_ids):
            raise ValueError("prompt tokenization longer than full tokenization")
        start = len(prompt_ids)
        # Sentencepiece merge at the boundary: move the split back by one.
        if prompt_ids != full[:start]:
            start -= 1
        return {"prompt_input_ids": full[:start], "input_ids": full[start:]}

    def tokenize_row_dpo(self, feature: dict) -> dict:
        """feature: {prompt, chosen, rejected, img_path?}. The prompt is the
        already-templated raw string ending with assistant_begin (the
        reference builds it via process_batch_conv with empty assistant —
        base/trainer.py:105-118); we do the same here."""
        n_images = 0
        if feature.get("img_path"):
            n_images = (
                len(feature["img_path"])
                if isinstance(feature["img_path"], list)
                else 1
            )
        if self.template.style == "chatml":
            return self._tokenize_row_dpo_chatml(feature, n_images)
        prompt_raw = self.process_conv(
            make_single_turn_conv(
                self.format_multimodal_prompt(feature["prompt"], n_images), ""
            )
        )["raw_str"]
        chosen = feature["chosen"] + self.template.assistant_end
        rejected = feature["rejected"] + self.template.assistant_end

        tok = self.tokenizer
        cfg = self.cfg
        prompt_ids = tok.encode(prompt_raw, add_special_tokens=False)
        chosen_t = self._build_tokenized_answer(prompt_raw, chosen)
        rejected_t = self._build_tokenized_answer(prompt_raw, rejected)
        prompt_len = min(
            len(chosen_t["prompt_input_ids"]), len(rejected_t["prompt_input_ids"])
        )
        prompt_ids = prompt_ids[:prompt_len]

        def with_bos(ids):
            if cfg.add_bos and tok.bos_token_id is not None:
                return [tok.bos_token_id] + ids
            return ids

        prompt_ids = with_bos(prompt_ids)
        chosen_prompt = with_bos(chosen_t["prompt_input_ids"])
        rejected_prompt = with_bos(rejected_t["prompt_input_ids"])
        chosen_ans = chosen_t["input_ids"] + [tok.eos_token_id]
        rejected_ans = rejected_t["input_ids"] + [tok.eos_token_id]

        longer = max(len(chosen_ans), len(rejected_ans))
        rows = {"prompt": prompt_ids, "chosen": chosen_prompt, "rejected": rejected_prompt}
        for k, ids in rows.items():
            if len(ids) + longer > cfg.max_length:
                if cfg.truncation_mode == "keep_start":
                    rows[k] = ids[: cfg.max_prompt_length]
                else:
                    rows[k] = ids[-cfg.max_prompt_length :]
        chosen_prompt, rejected_prompt = rows["chosen"], rows["rejected"]
        if len(chosen_prompt) + longer > cfg.max_length:
            chosen_ans = chosen_ans[: cfg.max_length - cfg.max_prompt_length]
        if len(rejected_prompt) + longer > cfg.max_length:
            rejected_ans = rejected_ans[: cfg.max_length - cfg.max_prompt_length]

        chosen_ids = chosen_prompt + chosen_ans
        rejected_ids = rejected_prompt + rejected_ans
        chosen_labels = [LABEL_PAD] * len(chosen_prompt) + chosen_ans
        rejected_labels = [LABEL_PAD] * len(rejected_prompt) + rejected_ans
        if cfg.prefix_image_tokens and n_images:
            pre = [cfg.image_token_id] * n_images
            chosen_ids = pre + chosen_ids
            rejected_ids = pre + rejected_ids
            chosen_labels = [LABEL_PAD] * n_images + chosen_labels
            rejected_labels = [LABEL_PAD] * n_images + rejected_labels
        out = {
            "chosen_input_ids": chosen_ids,
            "chosen_labels": chosen_labels,
            "rejected_input_ids": rejected_ids,
            "rejected_labels": rejected_labels,
            "prompt_input_ids": rows["prompt"],
            "img_path": feature.get("img_path"),
        }
        if self.qformer_tokenizer is not None:
            out["qformer_input_ids"] = self.qformer_ids(feature["prompt"])
        return out

    def _tokenize_row_dpo_chatml(self, feature: dict, n_images: int) -> dict:
        """Qwen ChatML DPO row (QwenVLDPOTrainer.tokenize_row,
        /root/reference/src/vlrlhf/models/QwenVL/__init__.py:257-347):
        prompt/answer token streams come from the ChatML builder (labels
        already set), EOS appended to answers, TRL-style truncation."""
        cfg = self.cfg
        eos = self.tokenizer.eos_token_id
        prompt = self.format_multimodal_prompt(feature["prompt"], n_images)
        chosen_c = self.process_conv(
            make_single_turn_conv(prompt, feature["chosen"])
        )
        rejected_c = self.process_conv(
            make_single_turn_conv(prompt, feature["rejected"])
        )
        prompt_ids = list(chosen_c["prompt_ids"])
        chosen_ans = list(chosen_c["answer_ids"]) + [eos]
        chosen_lab = list(chosen_c["answer_labels"]) + [eos]
        rejected_ans = list(rejected_c["answer_ids"]) + [eos]
        rejected_lab = list(rejected_c["answer_labels"]) + [eos]

        longer = max(len(chosen_ans), len(rejected_ans))
        if len(prompt_ids) + longer > cfg.max_length:
            if cfg.truncation_mode == "keep_start":
                prompt_ids = prompt_ids[: cfg.max_prompt_length]
            else:
                prompt_ids = prompt_ids[-cfg.max_prompt_length :]
        if len(prompt_ids) + longer > cfg.max_length:
            cut = cfg.max_length - cfg.max_prompt_length
            chosen_ans, chosen_lab = chosen_ans[:cut], chosen_lab[:cut]
            rejected_ans, rejected_lab = rejected_ans[:cut], rejected_lab[:cut]

        prompt_pad = [LABEL_PAD] * len(prompt_ids)
        return {
            "chosen_input_ids": prompt_ids + chosen_ans,
            "chosen_labels": prompt_pad + chosen_lab,
            "rejected_input_ids": prompt_ids + rejected_ans,
            "rejected_labels": prompt_pad + rejected_lab,
            "prompt_input_ids": prompt_ids,
            "img_path": feature.get("img_path"),
        }

    # ─────────── SFT row tokenization ───────────

    def tokenize_row_sft(self, feature: dict) -> dict:
        """feature: {prompt, answer|conversations, img_path?} — mirrors
        VLSFTTrainer.tokenize_row (base/trainer.py:633-652)."""
        n_images = 1 if feature.get("img_path") else 0
        if "conversations" in feature:
            conv = list(feature["conversations"])
            conv[0] = dict(
                conv[0],
                value=self.format_multimodal_prompt(conv[0]["value"], n_images),
            )
        else:
            conv = make_single_turn_conv(
                self.format_multimodal_prompt(feature["prompt"], n_images),
                feature["answer"],
            )
        out = self.process_conv(conv, add_end_for_empty_value=True)
        ids, labels = out["input_ids"], out["labels"]
        if self.template.assistant_end == "" and self.tokenizer.eos_token_id is not None:
            ids = ids + [self.tokenizer.eos_token_id]
            labels = labels + [self.tokenizer.eos_token_id]
        if self.cfg.prefix_image_tokens and n_images:
            ids = [self.cfg.image_token_id] * n_images + ids
            labels = [LABEL_PAD] * n_images + labels
        ids = ids[: self.cfg.max_length]
        labels = labels[: self.cfg.max_length]
        out = {
            "input_ids": ids,
            "labels": labels,
            "img_path": feature.get("img_path"),
        }
        if self.qformer_tokenizer is not None:
            src_text = feature.get("prompt") or feature["conversations"][0]["value"]
            out["qformer_input_ids"] = self.qformer_ids(src_text)
        return out

    # ─────────── image token expansion ───────────

    def expand_image_tokens(
        self,
        input_ids: Sequence[int],
        labels: Optional[Sequence[int]] = None,
        counts: Optional[Sequence[int]] = None,  # anyres: per-image counts
    ) -> tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        """Expand each image placeholder id into num_image_tokens copies
        (or `counts[i]` copies for anyres variable-size images).

        Returns (new_ids, new_labels, image_positions) where image_positions
        has one entry per expanded image token.
        """
        ids = np.asarray(input_ids)
        img_id = self.cfg.image_token_id
        occ = np.nonzero(ids == img_id)[0]
        if len(occ) == 0:
            return ids, (None if labels is None else np.asarray(labels)), np.zeros((0,), np.int32)
        pad_id = self.cfg.image_pad_id if self.cfg.image_pad_id is not None else img_id
        wrapped = self.cfg.image_start_id is not None
        out_ids, out_labels, positions = [], [], []
        prev = 0
        for j, o in enumerate(occ):
            n_tok = (
                int(counts[j]) if counts is not None else self.cfg.num_image_tokens
            )
            out_ids.extend(ids[prev:o].tolist())
            if labels is not None:
                out_labels.extend(list(labels[prev:o]))
            if wrapped:
                out_ids.append(self.cfg.image_start_id)
                if labels is not None:
                    out_labels.append(LABEL_PAD)
            start = len(out_ids)
            out_ids.extend([pad_id] * n_tok)
            if labels is not None:
                out_labels.extend([LABEL_PAD] * n_tok)
            positions.extend(range(start, start + n_tok))
            if wrapped:
                out_ids.append(self.cfg.image_end_id)
                if labels is not None:
                    out_labels.append(LABEL_PAD)
            prev = o + 1
        out_ids.extend(ids[prev:].tolist())
        if labels is not None:
            out_labels.extend(list(labels[prev:]))
        return (
            np.asarray(out_ids, np.int32),
            None if labels is None else np.asarray(out_labels, np.int64),
            np.asarray(positions, np.int32),
        )
