"""Data layer: processor labeling, DPO tokenize-row, collators, builders."""

import numpy as np
import pytest

from vlrlhf_tpu.data.chat_templates import TEMPLATES
from vlrlhf_tpu.data.collators import (
    CollatorConfig,
    DPOCollator,
    GenerationCollator,
    SFTCollator,
)
from vlrlhf_tpu.data.datasets import make_vlfeedback_pairs, train_eval_split
from vlrlhf_tpu.data.processor import (
    LABEL_PAD,
    ProcessorConfig,
    VLProcessor,
    make_single_turn_conv,
)
from vlrlhf_tpu.data.tokenizer import ToyTokenizer

N_IMG_TOKENS = 4


def make_processor(template="llava", num_image_tokens=N_IMG_TOKENS, **kw):
    tok = ToyTokenizer()
    cfg = ProcessorConfig(
        num_image_tokens=num_image_tokens,
        image_token="<image>",
        image_token_id=3,  # ToyTokenizer's <image> id
        max_length=kw.pop("max_length", 64),
        max_prompt_length=kw.pop("max_prompt_length", 48),
    )
    return VLProcessor(tok, TEMPLATES[template], cfg)


def fake_image_loader(path, size, mode):
    rng = np.random.default_rng(abs(hash(path)) % 2**32)
    return rng.integers(0, 255, (size, size, 3), np.uint8)


def test_process_conv_labels_only_on_assistant():
    p = make_processor()
    conv = make_single_turn_conv("what color is the cat?", "the cat is white")
    out = p.process_conv(conv)
    ids, labels = out["input_ids"], out["labels"]
    assert len(ids) == len(labels)
    answer_ids = p.tokenizer.encode("the cat is white")
    labeled = [l for l in labels if l != LABEL_PAD]
    assert labeled == answer_ids[-len(labeled) :]
    # prompt region fully masked
    n_prompt = len(labels) - len(labeled)
    assert all(l == LABEL_PAD for l in labels[:n_prompt])


def test_process_conv_empty_assistant_is_promptlike():
    p = make_processor()
    out = p.process_conv(make_single_turn_conv("hello there", ""))
    assert all(l == LABEL_PAD for l in out["labels"])
    assert out["raw_str"].endswith("ASSISTANT: ")


def test_tokenize_row_dpo_structure():
    p = make_processor()
    row = p.tokenize_row_dpo(
        {"prompt": "describe the image", "chosen": "a dog", "rejected": "a cat",
         "img_path": "img.jpg"}
    )
    tok = p.tokenizer
    for side in ("chosen", "rejected"):
        ids, labels = row[f"{side}_input_ids"], row[f"{side}_labels"]
        assert len(ids) == len(labels)
        assert ids[0] == tok.bos_token_id
        assert ids[-1] == tok.eos_token_id
        # prompt region masked, answer region labeled
        n_masked = sum(1 for l in labels if l == LABEL_PAD)
        assert 0 < n_masked < len(labels)
        # labels equal ids on the answer
        for i, l in enumerate(labels):
            if l != LABEL_PAD:
                assert l == ids[i]
    # both sides share the prompt (same masked prefix)
    ncp = sum(1 for l in row["chosen_labels"] if l == LABEL_PAD)
    nrp = sum(1 for l in row["rejected_labels"] if l == LABEL_PAD)
    assert row["chosen_input_ids"][:ncp] == row["rejected_input_ids"][:nrp]


def test_tokenize_row_dpo_truncation():
    p = make_processor(max_length=24, max_prompt_length=12)
    long_prompt = " ".join(f"word{i}" for i in range(40))
    row = p.tokenize_row_dpo(
        {"prompt": long_prompt, "chosen": "yes", "rejected": "no definitely not"}
    )
    assert len(row["chosen_input_ids"]) <= 24
    assert len(row["rejected_input_ids"]) <= 24


def test_expand_image_tokens():
    p = make_processor()
    ids = [1, 3, 10, 11, 3, 12]  # two image placeholders (id 3)
    labels = [-100, -100, 20, 21, -100, 22]
    new_ids, new_labels, pos = p.expand_image_tokens(ids, labels)
    assert len(new_ids) == len(ids) + 2 * (N_IMG_TOKENS - 1)
    assert len(pos) == 2 * N_IMG_TOKENS
    assert all(new_ids[q] == 3 for q in pos)
    assert all(new_labels[q] == LABEL_PAD for q in pos)
    # non-image tokens preserved in order
    kept = [t for t in new_ids if t != 3]
    assert kept == [1, 10, 11, 12]


def test_dpo_collator_shapes_and_layout():
    p = make_processor()
    ccfg = CollatorConfig(
        pad_token_id=0, bucket_multiple=16, max_images=1, image_size=32
    )
    coll = DPOCollator(p, ccfg, image_loader=fake_image_loader)
    rows = [
        p.tokenize_row_dpo(
            {"prompt": f"q {i}", "chosen": "yes sir", "rejected": "no way ever",
             "img_path": f"img{i}.jpg"}
        )
        for i in range(3)
    ]
    batch = coll(rows)
    b2, L = batch["input_ids"].shape
    assert b2 == 6 and L % 16 == 0
    assert batch["labels"].shape == (6, L)
    assert batch["pixel_values"].shape == (3, 1, 32, 32, 3)
    assert batch["image_positions"].shape == (6, N_IMG_TOKENS)
    # chosen first half: row i and row 3+i share the same prompt prefix
    ids = batch["input_ids"]
    pos = batch["image_positions"]
    for i in range(3):
        assert (pos[i] >= 0).all()
        assert (ids[i][pos[i]] == 3).all()
        np.testing.assert_array_equal(pos[i], pos[3 + i])


def test_dpo_collator_ddpo_masks():
    p = make_processor()
    ccfg = CollatorConfig(
        pad_token_id=0, bucket_multiple=16, image_size=16, compute_diff_mask=True,
        diff_min_match_size=1,
    )
    coll = DPOCollator(p, ccfg, image_loader=fake_image_loader)
    rows = [
        p.tokenize_row_dpo(
            {"prompt": "q", "chosen": "the sky is blue today",
             "rejected": "the sky is red today"}
        )
    ]
    batch = coll(rows)
    lm = batch["loss_mask"]
    assert lm.shape == batch["labels"].shape
    assert lm[0].sum() >= 1 and lm[1].sum() >= 1  # only the differing word
    # diff mask only on labeled tokens
    assert not (lm & (batch["labels"] == LABEL_PAD)).any()


def test_generation_collator_right_pads():
    p = make_processor()
    ccfg = CollatorConfig(pad_token_id=0, bucket_multiple=16, image_size=16)
    coll = GenerationCollator(p, ccfg, image_loader=fake_image_loader)
    prompts = ["short", "a much longer prompt with many words here"]
    rows = []
    for q in prompts:
        conv = make_single_turn_conv(p.format_multimodal_prompt(q, 1), "")
        rows.append(
            {"input_ids": p.process_conv(conv)["input_ids"], "img_path": "x.jpg"}
        )
    batch = coll(rows)
    ids, mask = batch["input_ids"], batch["pad_mask"]
    # padding strictly on the RIGHT (engine decodes from each prompt_len slot)
    for i in range(2):
        n = int(batch["prompt_lens"][i])
        assert mask[i][:n].all()
        assert (~mask[i][n:]).all()
    # image positions point at image tokens
    pos = batch["image_positions"][0]
    assert (ids[0][pos] == 3).all()


def test_vlfeedback_pairing():
    def anno(r):
        return {"helpfulness": {"Rating": str(r)}}

    samples = [
        {
            "prompt": "p1",
            "img_path": "i1.jpg",
            "completions": {
                "annotations": [[anno(5)], [anno(3)], [anno(1)]],
                "response": ["best", "mid", "worst"],
            },
        }
    ]
    # flatten annotation lists into the reference's per-completion dict form
    for s in samples:
        s["completions"]["annotations"] = [
            a[0] for a in s["completions"]["annotations"]
        ]
    # margin -1: only max-gap pair (5 vs 1)
    pairs = make_vlfeedback_pairs(samples, score_margin=-1)
    assert len(pairs) == 1
    assert pairs[0]["chosen"] == "best" and pairs[0]["rejected"] == "worst"
    # margin 2: pairs with gap >= 2 => (5,3), (5,1), (3,1)... gaps 2, 4, 2
    pairs = make_vlfeedback_pairs(samples, score_margin=2)
    assert len(pairs) == 3
    # ties and unparseable ratings skipped
    samples[0]["completions"]["annotations"] = [
        anno(3), anno(3), {"helpfulness": {"Rating": "N/A"}}
    ]
    assert make_vlfeedback_pairs(samples, -1) == []


def test_train_eval_split_deterministic():
    rows = [{"i": i} for i in range(1000)]
    tr1, ev1 = train_eval_split(rows)
    tr2, ev2 = train_eval_split(rows)
    assert ev1 == ev2 and len(ev1) == 5 and len(tr1) == 995


def test_sft_collator():
    p = make_processor()
    ccfg = CollatorConfig(pad_token_id=0, bucket_multiple=16, image_size=16)
    coll = SFTCollator(p, ccfg, image_loader=fake_image_loader)
    rows = [
        p.tokenize_row_sft(
            {"prompt": "what is this", "answer": "a tree", "img_path": "a.jpg"}
        ),
        p.tokenize_row_sft(
            {"prompt": "longer question about the scene", "answer": "a house",
             "img_path": "b.jpg"}
        ),
    ]
    batch = coll(rows)
    assert batch["input_ids"].shape == batch["labels"].shape
    assert (batch["labels"][~batch["pad_mask"]] == LABEL_PAD).all()
    # answers labeled
    assert (batch["labels"] != LABEL_PAD).sum() >= 4


def test_chatml_dpo_tokenize_row():
    """Qwen ChatML path: prompt from the system+user turns, answers carry
    im_start/.../im_end labels, EOS appended (QwenVL tokenize_row parity)."""
    p = make_processor(template="qwen_vl")
    row = p.tokenize_row_dpo(
        {"prompt": "what is it", "chosen": "a dog", "rejected": "a cat"}
    )
    tok = p.tokenizer
    im_start = tok.convert_token_to_id("<|im_start|>")
    for side in ("chosen", "rejected"):
        ids, labels = row[f"{side}_input_ids"], row[f"{side}_labels"]
        assert len(ids) == len(labels)
        assert ids[-1] == tok.eos_token_id and labels[-1] == tok.eos_token_id
        # prompt region fully masked
        np_prompt = len(row["prompt_input_ids"])
        assert all(l == LABEL_PAD for l in labels[:np_prompt])
        # answer starts with im_start, which is itself labeled (ChatML quirk)
        assert ids[np_prompt] == im_start and labels[np_prompt] == im_start
    # ChatML raw string starts with the system block
    out = p.process_conv(
        make_single_turn_conv("hi", "yo")
    )
    assert out["raw_str"].startswith("<|im_start|>system\n")
    assert len(out["input_ids"]) == len(out["labels"])


def test_qformer_ids_threaded_through():
    """InstructBLIP: collators ship padded Q-Former instruction ids."""
    from vlrlhf_tpu.data.chat_templates import TEMPLATES
    from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
    from vlrlhf_tpu.data.tokenizer import ToyTokenizer

    tok = ToyTokenizer()
    qtok = ToyTokenizer(vocab_size=64)
    p = VLProcessor(
        tok, TEMPLATES["instructblip"],
        ProcessorConfig(num_image_tokens=4, image_token="<image>",
                        image_token_id=3, max_length=64),
        qformer_tokenizer=qtok,
    )
    row = p.tokenize_row_dpo(
        {"prompt": "what is shown", "chosen": "a cat", "rejected": "a dog",
         "img_path": "x.jpg"}
    )
    assert "qformer_input_ids" in row and len(row["qformer_input_ids"]) > 0
    ccfg = CollatorConfig(pad_token_id=0, bucket_multiple=16, image_size=16)
    coll = DPOCollator(p, ccfg, image_loader=fake_image_loader)
    batch = coll([row, row])
    assert batch["qformer_input_ids"].shape[0] == 2
    assert batch["qformer_mask"].shape == batch["qformer_input_ids"].shape


def test_instructblip_prefix_image_tokens():
    """Prefix-embedding model: image tokens PREPENDED (before BOS), expanding
    to num_image_tokens at positions 0..N-1 (reference InstructBlip
    query-embeds prepend)."""
    from vlrlhf_tpu.data.chat_templates import TEMPLATES
    from vlrlhf_tpu.data.processor import ProcessorConfig, VLProcessor
    from vlrlhf_tpu.data.tokenizer import ToyTokenizer

    p = VLProcessor(
        ToyTokenizer(),
        TEMPLATES["instructblip"],
        ProcessorConfig(num_image_tokens=4, image_token="<image>",
                        image_token_id=3, max_length=64,
                        prefix_image_tokens=True),
    )
    row = p.tokenize_row_dpo(
        {"prompt": "what is it", "chosen": "a cat", "rejected": "a dog",
         "img_path": "x.jpg"}
    )
    ids, labels, pos = p.expand_image_tokens(
        row["chosen_input_ids"], row["chosen_labels"]
    )
    np.testing.assert_array_equal(pos, np.arange(4))
    assert (ids[:4] == 3).all()
    assert ids[4] == p.tokenizer.bos_token_id  # BOS follows the image block
    # text-only rows get no prefix
    row2 = p.tokenize_row_dpo(
        {"prompt": "hi", "chosen": "a", "rejected": "b"}
    )
    _, _, pos2 = p.expand_image_tokens(
        row2["chosen_input_ids"], row2["chosen_labels"]
    )
    assert len(pos2) == 0

    sft = p.tokenize_row_sft(
        {"prompt": "what", "answer": "yes", "img_path": "x.jpg"}
    )
    ids3, _, pos3 = p.expand_image_tokens(sft["input_ids"], sft["labels"])
    np.testing.assert_array_equal(pos3, np.arange(4))
