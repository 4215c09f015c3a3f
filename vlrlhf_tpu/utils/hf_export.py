"""Export vlrlhf_tpu param pytrees -> HF torch-layout checkpoints.

The reverse of utils/hf_port.py, and the equivalent of the reference's
merge_peft_model.py output contract
(/root/reference/src/vlrlhf/merge_peft_model.py:11-23): a trained/merged
model leaves this framework as a directory any HF tool (and the reference's
own eval harness) can load — safetensors weights in the original key layout
plus config/tokenizer files.

Every exporter inverts its porter exactly (transposes, conv layout, fused
projections, per-head interleavings); round-trip tests
(tests/test_hf_export.py) assert byte-level equality with the original HF
state_dict, which together with the port-parity tests guarantees logits
parity of the exported checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import numpy as np

PyTree = Any


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32) if np.asarray(x).dtype == np.dtype(
        "bfloat16"
    ) else np.asarray(x)


def _t(x) -> np.ndarray:
    return _np(x).T  # our (in,out) kernel -> torch Linear (out,in)


def _conv(x) -> np.ndarray:
    return np.transpose(_np(x), (3, 2, 0, 1))  # HWIO -> OIHW


class _SD(dict):
    """state_dict builder that rejects accidental double-writes."""

    def put(self, key: str, value: np.ndarray):
        assert key not in self, f"duplicate export key {key}"
        self[key] = np.ascontiguousarray(value)


def _ln(sd: _SD, prefix: str, node: dict, i: Optional[int] = None):
    w = _np(node["weight"])
    sd.put(f"{prefix}.weight", w[i] if i is not None else w)
    if "bias" in node:
        b = _np(node["bias"])
        sd.put(f"{prefix}.bias", b[i] if i is not None else b)


def _linear(sd: _SD, prefix: str, node: dict, i: Optional[int] = None):
    k = _np(node["kernel"])
    sd.put(f"{prefix}.weight", (k[i] if i is not None else k).T)
    if "bias" in node:
        b = _np(node["bias"])
        sd.put(f"{prefix}.bias", b[i] if i is not None else b)


# ───────────────────────── llama-style LM ─────────────────────────


def export_llama_lm(lm: PyTree, sd: _SD, prefix: str = "model"):
    """Inverse of port_llama_lm (hf_port.py:60-95)."""
    sd.put(f"{prefix}.embed_tokens.weight", _np(lm["embed_tokens"]["embedding"]))
    L = _np(lm["layers_scanned"]["input_layernorm"]["weight"]).shape[0]
    ls = lm["layers_scanned"]
    for i in range(L):
        p = f"{prefix}.layers.{i}"
        _ln(sd, f"{p}.input_layernorm", ls["input_layernorm"], i)
        _ln(sd, f"{p}.post_attention_layernorm", ls["post_attention_layernorm"], i)
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "o_proj")):
            _linear(sd, f"{p}.self_attn.{theirs}", ls["attn"][ours], i)
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
            _linear(sd, f"{p}.mlp.{theirs}", ls["mlp"][ours], i)
    _ln(sd, f"{prefix}.norm", lm["norm"])
    if "lm_head" in lm:
        head_prefix = prefix.rsplit(".", 1)[0] if prefix.endswith(".model") else ""
        key = f"{head_prefix}.lm_head.weight" if head_prefix else "lm_head.weight"
        sd.put(key, _t(lm["lm_head"]["kernel"]))


def export_qwen_lm(lm: PyTree, sd: _SD, prefix: str = "transformer"):
    """Inverse of port_qwen_lm: re-fuse wq/wk/wv into c_attn (block rows)."""
    sd.put(f"{prefix}.wte.weight", _np(lm["embed_tokens"]["embedding"]))
    ls = lm["layers_scanned"]
    L = _np(ls["input_layernorm"]["weight"]).shape[0]
    for i in range(L):
        p = f"{prefix}.h.{i}"
        _ln(sd, f"{p}.ln_1", ls["input_layernorm"], i)
        _ln(sd, f"{p}.ln_2", ls["post_attention_layernorm"], i)
        a = ls["attn"]
        w = np.concatenate(
            [_np(a[k]["kernel"])[i].T for k in ("wq", "wk", "wv")], axis=0
        )
        sd.put(f"{p}.attn.c_attn.weight", w)
        b = np.concatenate(
            [_np(a[k]["bias"])[i] for k in ("wq", "wk", "wv")], axis=0
        )
        sd.put(f"{p}.attn.c_attn.bias", b)
        _linear(sd, f"{p}.attn.c_proj", a["wo"], i)
        # modeling_qwen MLP: c_proj(w1(x) * silu(w2(x))) => w2=gate, w1=up
        _linear(sd, f"{p}.mlp.w2", ls["mlp"]["gate"], i)
        _linear(sd, f"{p}.mlp.w1", ls["mlp"]["up"], i)
        _linear(sd, f"{p}.mlp.c_proj", ls["mlp"]["down"], i)
    _ln(sd, f"{prefix}.ln_f", lm["norm"])
    sd.put("lm_head.weight", _t(lm["lm_head"]["kernel"]))


def export_internlm2_lm(
    lm: PyTree,
    sd: _SD,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    prefix: str = "model",
):
    """Inverse of port_internlm2_lm: re-fuse into the grouped-interleaved
    wqkv layout (modeling_internlm2.py)."""
    q_per_kv = num_heads // num_kv_heads
    sd.put(f"{prefix}.tok_embeddings.weight", _np(lm["embed_tokens"]["embedding"]))
    ls = lm["layers_scanned"]
    L = _np(ls["input_layernorm"]["weight"]).shape[0]
    for i in range(L):
        p = f"{prefix}.layers.{i}"
        _ln(sd, f"{p}.attention_norm", ls["input_layernorm"], i)
        _ln(sd, f"{p}.ffn_norm", ls["post_attention_layernorm"], i)
        a = ls["attn"]
        h = _np(a["wq"]["kernel"]).shape[1]
        wq = _np(a["wq"]["kernel"])[i].T.reshape(num_kv_heads, q_per_kv, head_dim, h)
        wk = _np(a["wk"]["kernel"])[i].T.reshape(num_kv_heads, 1, head_dim, h)
        wv = _np(a["wv"]["kernel"])[i].T.reshape(num_kv_heads, 1, head_dim, h)
        w = np.concatenate([wq, wk, wv], axis=1)  # (nkv, q_per_kv+2, hd, h)
        sd.put(f"{p}.attention.wqkv.weight", w.reshape(-1, h))
        _linear(sd, f"{p}.attention.wo", a["wo"], i)
        _linear(sd, f"{p}.feed_forward.w1", ls["mlp"]["gate"], i)
        _linear(sd, f"{p}.feed_forward.w3", ls["mlp"]["up"], i)
        _linear(sd, f"{p}.feed_forward.w2", ls["mlp"]["down"], i)
    _ln(sd, f"{prefix}.norm", lm["norm"])
    sd.put("output.weight", _t(lm["lm_head"]["kernel"]))


# ───────────────────────── vision towers ─────────────────────────


def export_clip_vit(v: PyTree, sd: _SD, prefix: str):
    """Inverse of port_clip_vit."""
    emb = f"{prefix}.embeddings"
    sd.put(f"{emb}.patch_embedding.weight", _conv(v["patch_embed"]["kernel"]))
    if "bias" in v["patch_embed"]:
        sd.put(f"{emb}.patch_embedding.bias", _np(v["patch_embed"]["bias"]))
    sd.put(f"{emb}.position_embedding.weight", _np(v["pos_embed"]["embedding"]))
    sd.put(f"{emb}.class_embedding", _np(v["cls"]["token"]))
    ls = v["layers_scanned"]
    L = _np(ls["ln1"]["weight"]).shape[0]
    for i in range(L):
        p = f"{prefix}.encoder.layers.{i}"
        _ln(sd, f"{p}.layer_norm1", ls["ln1"], i)
        _ln(sd, f"{p}.layer_norm2", ls["ln2"], i)
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "out_proj")):
            _linear(sd, f"{p}.self_attn.{theirs}", ls["attn"][ours], i)
        _linear(sd, f"{p}.mlp.fc1", ls["mlp"]["fc1"], i)
        _linear(sd, f"{p}.mlp.fc2", ls["mlp"]["fc2"], i)
    if "ln_pre" in v:
        _ln(sd, f"{prefix}.pre_layrnorm", v["ln_pre"])  # HF CLIP's (sic)
    if "ln_post" in v:
        _ln(sd, f"{prefix}.post_layernorm", v["ln_post"])


def export_qwen_visual(
    vision: PyTree,
    projector: PyTree,
    sd: _SD,
    vis_heads: int = 16,
    prefix: str = "transformer.visual",
):
    """Inverse of port_qwen_visual: re-interleave per-head [q;k;v] rows."""
    sd.put(f"{prefix}.conv1.weight", _conv(vision["patch_embed"]["kernel"]))
    sd.put(f"{prefix}.positional_embedding", _np(vision["pos_embed"]["embedding"]))
    _ln(sd, f"{prefix}.ln_pre", vision["ln_pre"])
    ls = vision["layers_scanned"]
    L = _np(ls["ln1"]["weight"]).shape[0]
    nh = vis_heads
    for i in range(L):
        p = f"{prefix}.transformer.resblocks.{i}"
        _ln(sd, f"{p}.ln_1", ls["ln1"], i)
        _ln(sd, f"{p}.ln_2", ls["ln2"], i)
        a = ls["attn"]
        kq = _np(a["wq"]["kernel"])[i]  # (h, d)
        kk = _np(a["wk"]["kernel"])[i]
        kv = _np(a["wv"]["kernel"])[i]
        h, d = kq.shape
        hd = d // nh
        w = np.stack(
            [kq.T.reshape(nh, hd, h), kk.T.reshape(nh, hd, h),
             kv.T.reshape(nh, hd, h)],
            axis=1,
        )  # (nh, 3, hd, h) — VisualAttention's per-head interleaved rows
        sd.put(f"{p}.attn.in_proj.weight", w.reshape(3 * d, h))
        b = np.stack(
            [_np(a[k]["bias"])[i].reshape(nh, hd) for k in ("wq", "wk", "wv")],
            axis=1,
        )
        sd.put(f"{p}.attn.in_proj.bias", b.reshape(3 * d))
        _linear(sd, f"{p}.attn.out_proj", a["wo"], i)
        _linear(sd, f"{p}.mlp.c_fc", ls["mlp"]["fc1"], i)
        _linear(sd, f"{p}.mlp.c_proj", ls["mlp"]["fc2"], i)
    ap = f"{prefix}.attn_pool"
    r = projector["resampler"]
    sd.put(f"{ap}.query", _np(r["query"]))
    sd.put(f"{ap}.pos_embed", _np(r["pos_embed"]))
    _ln(sd, f"{ap}.ln_q", r["ln_q"])
    _ln(sd, f"{ap}.ln_kv", r["ln_kv"])
    _linear(sd, f"{ap}.kv_proj", r["kv_proj"])
    # nn.MultiheadAttention block layout [q;k;v]
    sd.put(
        f"{ap}.attn.in_proj_weight",
        np.concatenate([_t(r["attn"][k]["kernel"]) for k in ("wq", "wk", "wv")], 0),
    )
    sd.put(
        f"{ap}.attn.in_proj_bias",
        np.concatenate([_np(r["attn"][k]["bias"]) for k in ("wq", "wk", "wv")], 0),
    )
    _linear(sd, f"{ap}.attn.out_proj", r["attn"]["wo"])
    _ln(sd, f"{prefix}.ln_post", projector["ln_post"])
    sd.put(f"{prefix}.proj", _np(projector["proj"]["kernel"]))  # stored untransposed


def export_instructblip_vit(v: PyTree, sd: _SD, prefix: str):
    """Inverse of port_instructblip_vit (fused block qkv, raw Parameters)."""
    emb = f"{prefix}.embeddings"
    sd.put(f"{emb}.patch_embedding.weight", _conv(v["patch_embed"]["kernel"]))
    sd.put(f"{emb}.patch_embedding.bias", _np(v["patch_embed"]["bias"]))
    sd.put(f"{emb}.position_embedding", _np(v["pos_embed"]["embedding"])[None])
    sd.put(f"{emb}.class_embedding", _np(v["cls"]["token"])[None, None])
    ls = v["layers_scanned"]
    L = _np(ls["ln1"]["weight"]).shape[0]
    for i in range(L):
        p = f"{prefix}.encoder.layers.{i}"
        _ln(sd, f"{p}.layer_norm1", ls["ln1"], i)
        _ln(sd, f"{p}.layer_norm2", ls["ln2"], i)
        a = ls["attn"]
        sd.put(
            f"{p}.self_attn.qkv.weight",
            np.concatenate(
                [_np(a[k]["kernel"])[i].T for k in ("wq", "wk", "wv")], 0
            ),
        )
        sd.put(
            f"{p}.self_attn.qkv.bias",
            np.concatenate([_np(a[k]["bias"])[i] for k in ("wq", "wk", "wv")], 0),
        )
        _linear(sd, f"{p}.self_attn.projection", a["wo"], i)
        _linear(sd, f"{p}.mlp.fc1", ls["mlp"]["fc1"], i)
        _linear(sd, f"{p}.mlp.fc2", ls["mlp"]["fc2"], i)
    _ln(sd, f"{prefix}.post_layernorm", v["ln_post"])


def export_qformer(q: PyTree, sd: _SD):
    sd.put("query_tokens", _np(q["query_tokens"])[None])
    e = q["embeddings"]
    sd.put("qformer.embeddings.word_embeddings.weight", _np(e["word"]["embedding"]))
    sd.put(
        "qformer.embeddings.position_embeddings.weight",
        _np(e["position"]["embedding"]),
    )
    _ln(sd, "qformer.embeddings.layernorm", e["ln"])
    for i, layer in enumerate(q["layers"]):
        p = f"qformer.encoder.layer.{i}"

        def bert_attn(node, ap, out_p):
            _linear(sd, f"{ap}.query", node["wq"])
            _linear(sd, f"{ap}.key", node["wk"])
            _linear(sd, f"{ap}.value", node["wv"])
            _linear(sd, f"{out_p}.dense", node["wo"])
            _ln(sd, f"{out_p}.LayerNorm", node["ln"])

        bert_attn(
            layer["self_attn"], f"{p}.attention.attention", f"{p}.attention.output"
        )
        if "cross_attn" in layer:
            bert_attn(
                layer["cross_attn"],
                f"{p}.crossattention.attention",
                f"{p}.crossattention.output",
            )
        _linear(sd, f"{p}.intermediate.dense", layer["ffn"]["fc1"])
        _linear(sd, f"{p}.output.dense", layer["ffn"]["fc2"])
        _ln(sd, f"{p}.output.LayerNorm", layer["ffn"]["ln"])
        _linear(sd, f"{p}.intermediate_query.dense", layer["ffn_query"]["fc1"])
        _linear(sd, f"{p}.output_query.dense", layer["ffn_query"]["fc2"])
        _ln(sd, f"{p}.output_query.LayerNorm", layer["ffn_query"]["ln"])


# ───────────────────────── assembled models ─────────────────────────


def export_llava(params: PyTree, cfg) -> dict[str, np.ndarray]:
    """4.41-era key layout (language_model.model.*), matching the reference's
    pinned transformers and what port_llava reads back natively."""
    sd = _SD()
    export_clip_vit(params["vision"], sd, "vision_tower.vision_model")
    _linear(sd, "multi_modal_projector.linear_1", params["projector"]["fc1"])
    _linear(sd, "multi_modal_projector.linear_2", params["projector"]["fc2"])
    export_llama_lm(params["lm"], sd, "language_model.model")
    if "image_newline" in params:
        sd.put("image_newline", _np(params["image_newline"]["embedding"]))
    return dict(sd)


def export_qwen_vl(params: PyTree, cfg) -> dict[str, np.ndarray]:
    sd = _SD()
    export_qwen_visual(
        params["vision"], params["projector"], sd,
        vis_heads=cfg.vision.num_heads,
    )
    export_qwen_lm(params["lm"], sd)
    return dict(sd)


def export_internlm_xc2(params: PyTree, cfg) -> dict[str, np.ndarray]:
    sd = _SD()
    export_clip_vit(params["vision"], sd, "vit.vision_tower.vision_model")
    _linear(sd, "vision_proj.0", params["projector"]["fc1"])
    _linear(sd, "vision_proj.2", params["projector"]["fc2"])
    export_internlm2_lm(
        params["lm"], sd, cfg.lm.num_heads, cfg.lm.num_kv_heads, cfg.lm.head_dim_
    )
    return dict(sd)


def export_xc2_plora(adapters: PyTree, cfg) -> dict[str, np.ndarray]:
    """Inverse of port_xc2_plora: adapter tree -> Plora_A/Plora_B weights.
    The fused-wqkv PLoRA shares one A; B re-fuses grouped-interleaved."""
    sd = _SD()
    ls = adapters.get("lm", {}).get("layers_scanned")
    if ls is None:
        return {}
    q_per_kv = cfg.lm.num_heads // cfg.lm.num_kv_heads
    hd = cfg.lm.head_dim_
    nkv = cfg.lm.num_kv_heads
    L = _np(ls["attn"]["wq"]["a"]).shape[0]
    for i in range(L):
        p = f"model.layers.{i}"
        a = _np(ls["attn"]["wq"]["a"])[i]  # (h, r) shared across q/k/v
        r = a.shape[1]
        sd.put(f"{p}.attention.wqkv.Plora_A.weight", a.T)
        bq = _np(ls["attn"]["wq"]["b"])[i].T.reshape(nkv, q_per_kv, hd, r)
        bk = _np(ls["attn"]["wk"]["b"])[i].T.reshape(nkv, 1, hd, r)
        bv = _np(ls["attn"]["wv"]["b"])[i].T.reshape(nkv, 1, hd, r)
        b = np.concatenate([bq, bk, bv], axis=1).reshape(-1, r)
        sd.put(f"{p}.attention.wqkv.Plora_B.weight", b)
        sd.put(f"{p}.attention.wo.Plora_A.weight", _np(ls["attn"]["wo"]["a"])[i].T)
        sd.put(f"{p}.attention.wo.Plora_B.weight", _np(ls["attn"]["wo"]["b"])[i].T)
        for ours, theirs in (("gate", "w1"), ("up", "w3"), ("down", "w2")):
            sd.put(
                f"{p}.feed_forward.{theirs}.Plora_A.weight",
                _np(ls["mlp"][ours]["a"])[i].T,
            )
            sd.put(
                f"{p}.feed_forward.{theirs}.Plora_B.weight",
                _np(ls["mlp"][ours]["b"])[i].T,
            )
    return dict(sd)


def export_instructblip(params: PyTree, cfg) -> dict[str, np.ndarray]:
    sd = _SD()
    export_instructblip_vit(params["vision"], sd, "vision_model")
    export_qformer(params["qformer"], sd)
    _linear(sd, "language_projection", params["projector"]["fc1"])
    export_llama_lm(params["lm"], sd, "language_model.model")
    return dict(sd)


EXPORTERS = {
    "llava": export_llava,
    "llava_next_vicuna": export_llava,
    "llava_next_mistral": export_llava,
    "qwen_vl": export_qwen_vl,
    "internlm_xc2": export_internlm_xc2,
    "instructblip": export_instructblip,
}

ARCHITECTURES = {
    "llava": ["LlavaForConditionalGeneration"],
    "llava_next_vicuna": ["LlavaNextForConditionalGeneration"],
    "llava_next_mistral": ["LlavaNextForConditionalGeneration"],
    "qwen_vl": ["QWenLMHeadModel"],
    "internlm_xc2": ["InternLMXComposer2ForCausalLM"],
    "instructblip": ["InstructBlipForConditionalGeneration"],
}

# Files copied verbatim from the source checkpoint so the exported dir is a
# complete, loadable HF checkpoint (tokenizer + processor + remote code).
_SIDEGAR_PATTERNS = (
    "tokenizer", "special_tokens", "preprocessor", "processor", "chat_template",
    "generation_config", "added_tokens", "vocab", "merges", "qwen.tiktoken",
    "configuration_", "modeling_", "tokenization_", "visual.py", "build_mlp",
)


def save_hf_checkpoint(
    state_dict: dict[str, np.ndarray],
    out_dir: str,
    family: str,
    base_dir: Optional[str] = None,
    dtype: str = "bfloat16",
):
    """Write model.safetensors (+ config/tokenizer files) to out_dir.

    If base_dir (the source HF checkpoint) is given, its config.json is
    copied with `architectures` restored (merge_peft_model.py:17-20) and all
    tokenizer/processor/remote-code files are carried over so the directory
    is self-contained. Without base_dir a minimal config.json is written
    (weights remain loadable; the user supplies config/tokenizer)."""
    os.makedirs(out_dir, exist_ok=True)
    import ml_dtypes

    np_dtype = {"bfloat16": ml_dtypes.bfloat16, "float32": np.float32,
                "float16": np.float16}[dtype]
    cast = {
        k: (v.astype(np_dtype) if np.issubdtype(v.dtype, np.floating) else v)
        for k, v in state_dict.items()
    }
    from safetensors.numpy import save_file

    save_file(cast, os.path.join(out_dir, "model.safetensors"))

    config = {"architectures": ARCHITECTURES[family], "torch_dtype": dtype}
    if base_dir and os.path.exists(os.path.join(base_dir, "config.json")):
        with open(os.path.join(base_dir, "config.json")) as f:
            config = json.load(f)
        config["architectures"] = ARCHITECTURES[family]
        config["torch_dtype"] = dtype
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    if base_dir and os.path.isdir(base_dir):
        for name in os.listdir(base_dir):
            if any(pat in name for pat in _SIDEGAR_PATTERNS):
                src = os.path.join(base_dir, name)
                if os.path.isfile(src):
                    shutil.copy2(src, os.path.join(out_dir, name))


def export_hf(
    params: PyTree,
    cfg,
    family: str,
    out_dir: str,
    base_dir: Optional[str] = None,
    plora_adapters: Optional[PyTree] = None,
    dtype: str = "bfloat16",
) -> dict[str, np.ndarray]:
    """Full export: params tree -> HF checkpoint dir. Returns the state_dict
    (numpy) for inspection/tests."""
    sd = EXPORTERS[family](params, cfg)
    if family == "internlm_xc2" and plora_adapters:
        sd.update(export_xc2_plora(plora_adapters, cfg))
    save_hf_checkpoint(sd, out_dir, family, base_dir, dtype)
    return sd
