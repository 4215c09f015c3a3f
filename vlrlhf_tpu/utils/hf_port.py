"""Port HF torch checkpoints -> vlrlhf_tpu param pytrees.

Replaces the reference's reliance on `from_pretrained` over vendored model
code: weights load from a HF state_dict (safetensors / torch .bin, or an
in-memory dict for tests) into our functional trees, with layer stacking for
the scanned decoder and layout transposes (torch Linear stores (out, in); we
store (in, out); conv OIHW -> HWIO).

Every mapping is unit-tested against a randomly-initialized HF transformers
model: our forward must match HF's logits on CPU fp32 (tests/test_hf_port.py)
— the concrete mechanism behind the "per-step DPO loss parity within 1e-3"
target (BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.models.vlm import VLMConfig

PyTree = Any
StateDict = Mapping[str, np.ndarray]


_DEV_CAST = None  # set by port_dtype(); floating tensors cast host-side
_DEV_HOST = False  # inside _stack: keep tensors numpy until stacked
_QUANT_REGS = None  # set by port_quantize(); per-layer host quantize
_QUANT_BITS = 8  # 8 = int8; 4 = group-wise packed int4 (ops/int4.py)


def _dev(x):
    """Host tensor -> device array. Under port_dtype(...) floating tensors
    are cast host-side first, so only target-width bytes cross the host->HBM
    link and no full-precision twin ever lives on device (a 7B f32 port +
    post-hoc cast_tree would need 28+14 GiB of HBM; streaming bf16 needs
    14). In _host_tensors scope the numpy array is returned as-is: large
    numpy buffers are mmap'd by glibc and RETURNED TO THE OS on free,
    whereas transient device buffers can linger in the client allocator —
    the layer stacker exploits this to keep the port's peak anonymous RSS
    at ~one stacked leaf."""
    x = np.asarray(x)
    if _DEV_CAST is not None and np.issubdtype(x.dtype, np.floating):
        x = x.astype(_DEV_CAST)
    if _DEV_HOST:
        return x
    return jnp.asarray(x)


import contextlib


@contextlib.contextmanager
def port_dtype(dtype):
    """All floating tensors ported inside this context are cast to `dtype`
    before device transfer (transforms still run in the checkpoint's source
    precision on host — numerically identical to port-then-cast_tree)."""
    global _DEV_CAST
    prev = _DEV_CAST
    _DEV_CAST = dtype
    try:
        yield
    finally:
        _DEV_CAST = prev


@contextlib.contextmanager
def port_quantize(patterns, bits: int = 8):
    """Quantize-during-port: linears under a `_stack(..., path=...)` whose
    '/'-joined module path matches any pattern are int8-quantized ON HOST
    (ops/quant.quantize_kernel_np), per layer, before device transfer. The
    device transient for a 7B LM stack drops from 13.2 GiB bf16 to 6.6 GiB
    int8 — the difference between a judge co-residency load fitting next to
    a resident eval model and OOM (VERDICT r2 item 8). Non-stacked matches
    (lm_head, projector) still port bf16 — the loader's cheap post-pass
    quantize_params jit catches them (cli/loading.py load_model_bundle).

    Production analog of the reference's load-time GPTQ quantization
    (/root/reference/src/vlrlhf/utils/auto_load.py:509-578 q_lora/bits)."""
    import re as _re

    global _QUANT_REGS, _QUANT_BITS
    prev, prev_bits = _QUANT_REGS, _QUANT_BITS
    _QUANT_REGS = [_re.compile(p) for p in patterns]
    _QUANT_BITS = bits
    try:
        yield
    finally:
        _QUANT_REGS, _QUANT_BITS = prev, prev_bits


def _quant_layer_host(tree, path: str):
    """Walk one per-layer host-numpy dict, replacing linear dicts whose
    module path matches _QUANT_REGS with {kernel_q, kernel_scale[, bias]}."""
    from vlrlhf_tpu.ops.quant import quantize_kernel_np

    if isinstance(tree, dict) and "kernel" in tree:
        if any(r.search(path) for r in _QUANT_REGS):
            k = tree["kernel"]
            # kind check, not issubdtype: ml_dtypes' bfloat16 (what
            # port_dtype casts to host-side) is not an np.floating subclass
            if isinstance(k, np.ndarray) and k.dtype.kind not in "iub":
                if _QUANT_BITS == 4 and k.shape[0] % 128 == 0:
                    from vlrlhf_tpu.ops.int4 import quantize_kernel_int4_np

                    q, scale = quantize_kernel_int4_np(k)
                    out = {"kernel_q4": q, "kernel_scale": scale}
                else:  # int8 (also the int4 fallback for narrow linears)
                    q, scale = quantize_kernel_np(k)
                    out = {"kernel_q": q, "kernel_scale": scale}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
        return tree
    if isinstance(tree, dict):
        return {
            k: _quant_layer_host(v, f"{path}/{k}") for k, v in tree.items()
        }
    return tree


def _t(w) -> np.ndarray:
    return np.asarray(w).T  # torch Linear (out,in) -> (in,out)


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _stack_trees(trees: list) -> PyTree:
    """Stack per-layer trees into leading-layer-axis leaves, POPPING each
    consumed leaf so per-layer buffers free as each stacked leaf is built —
    peak extra memory is ONE stacked leaf, not a second copy of the whole
    decoder (matters at 7B on a 16 GiB chip). numpy leaves (from _stack's
    host scope) stack on host and device-transfer once."""
    if isinstance(trees[0], dict):
        return {
            k: _stack_trees([t.pop(k) for t in trees])
            for k in list(trees[0].keys())
        }
    if isinstance(trees[0], np.ndarray):
        out = _dev(np.stack(trees))
        trees.clear()  # free per-layer host buffers back to the OS now
        return out
    return jnp.stack(trees)


def _stack(fn: Callable[[int], dict], n: int, path: str = "") -> dict:
    """`path` names the stacked module's tree position (e.g.
    "lm/layers_scanned") so port_quantize can match quant patterns against
    full module paths; each layer is quantized host-side as it is read, so
    peak host memory stays one bf16 layer + its int8 twin."""
    global _DEV_HOST
    prev = _DEV_HOST
    _DEV_HOST = True
    try:
        if _QUANT_REGS is not None and path:
            layers = [_quant_layer_host(fn(i), path) for i in range(n)]
        else:
            layers = [fn(i) for i in range(n)]
    finally:
        _DEV_HOST = prev
    return _stack_trees(layers)


def _ln(sd: StateDict, prefix: str) -> dict:
    out = {"weight": _dev(np.asarray(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _dev(np.asarray(sd[f"{prefix}.bias"]))
    return out


def _linear(sd: StateDict, prefix: str) -> dict:
    if f"{prefix}.qweight" in sd:
        # pre-quantized GPTQ linear (AutoGPTQ layout — the reference loads
        # these via AutoGPTQForCausalLM, auto_load.py:527-531): ingest the
        # calibrated codes directly into ops/int4's representation instead
        # of a float round-trip (utils/gptq.py; zero-points become the
        # kernel_gbias leaf)
        from vlrlhf_tpu.utils.gptq import convert_gptq_linear

        g_idx = (np.asarray(sd[f"{prefix}.g_idx"])
                 if f"{prefix}.g_idx" in sd else None)
        out = {
            k: _dev(v)
            for k, v in convert_gptq_linear(
                np.asarray(sd[f"{prefix}.qweight"]),
                np.asarray(sd[f"{prefix}.qzeros"]),
                np.asarray(sd[f"{prefix}.scales"]),
                g_idx,
            ).items()
        }
    else:
        out = {"kernel": _dev(_t(sd[f"{prefix}.weight"]))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _dev(np.asarray(sd[f"{prefix}.bias"]))
    return out


# ───────────────────────── llama-style LM ─────────────────────────


def port_llama_lm(sd: StateDict, n_layers: int, prefix: str = "model") -> PyTree:
    """HF Llama/Mistral/Vicuna -> our LM tree. `prefix` e.g.
    'language_model.model' inside a llava checkpoint."""

    def layer(i):
        p = f"{prefix}.layers.{i}"
        return {
            "input_layernorm": _ln(sd, f"{p}.input_layernorm"),
            "post_attention_layernorm": _ln(sd, f"{p}.post_attention_layernorm"),
            "attn": {
                "wq": _linear(sd, f"{p}.self_attn.q_proj"),
                "wk": _linear(sd, f"{p}.self_attn.k_proj"),
                "wv": _linear(sd, f"{p}.self_attn.v_proj"),
                "wo": _linear(sd, f"{p}.self_attn.o_proj"),
            },
            "mlp": {
                "gate": _linear(sd, f"{p}.mlp.gate_proj"),
                "up": _linear(sd, f"{p}.mlp.up_proj"),
                "down": _linear(sd, f"{p}.mlp.down_proj"),
            },
        }

    head_prefix = prefix.rsplit(".", 1)[0] if prefix.endswith(".model") else prefix
    out = {
        "embed_tokens": {
            "embedding": _dev(np.asarray(sd[f"{prefix}.embed_tokens.weight"]))
        },
        "layers_scanned": _stack(layer, n_layers, path="lm/layers_scanned"),
        "norm": _ln(sd, f"{prefix}.norm"),
    }
    lm_head_key = f"{head_prefix}.lm_head.weight"
    if lm_head_key not in sd and "lm_head.weight" in sd:
        lm_head_key = "lm_head.weight"
    if lm_head_key in sd:
        out["lm_head"] = {"kernel": _dev(_t(sd[lm_head_key]))}
    return out


def port_qwen_lm(sd: StateDict, n_layers: int, prefix: str = "transformer") -> PyTree:
    """QWen (Qwen-VL's LM): fused c_attn splits into wq/wk/wv; mlp w2=gate,
    w1=up, c_proj=down (modeling_qwen.py MLP: c_proj(w1(x) * silu(w2(x))))."""

    def layer(i):
        p = f"{prefix}.h.{i}"
        c_attn_w = np.asarray(sd[f"{p}.attn.c_attn.weight"])  # (3h, h)
        c_attn_b = np.asarray(sd[f"{p}.attn.c_attn.bias"])
        h = c_attn_w.shape[1]
        wq, wk, wv = np.split(c_attn_w, 3, axis=0)
        bq, bk, bv = np.split(c_attn_b, 3, axis=0)
        return {
            "input_layernorm": _ln(sd, f"{p}.ln_1"),
            "post_attention_layernorm": _ln(sd, f"{p}.ln_2"),
            "attn": {
                "wq": {"kernel": _dev(wq.T), "bias": _dev(bq)},
                "wk": {"kernel": _dev(wk.T), "bias": _dev(bk)},
                "wv": {"kernel": _dev(wv.T), "bias": _dev(bv)},
                "wo": _linear(sd, f"{p}.attn.c_proj"),
            },
            "mlp": {
                "gate": _linear(sd, f"{p}.mlp.w2"),
                "up": _linear(sd, f"{p}.mlp.w1"),
                "down": _linear(sd, f"{p}.mlp.c_proj"),
            },
        }

    return {
        "embed_tokens": {
            "embedding": _dev(np.asarray(sd[f"{prefix}.wte.weight"]))
        },
        "layers_scanned": _stack(layer, n_layers, path="lm/layers_scanned"),
        "norm": _ln(sd, f"{prefix}.ln_f"),
        "lm_head": {"kernel": _dev(_t(sd["lm_head.weight"]))},
    }


def port_internlm2_lm(
    sd: StateDict,
    n_layers: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    prefix: str = "model",
) -> PyTree:
    """InternLM2: fused wqkv with grouped-interleaved layout
    (modeling_internlm2.py: wqkv reshaped to (groups, q_per_kv + 2, hd, h))."""
    q_per_kv = num_heads // num_kv_heads

    def layer(i):
        p = f"{prefix}.layers.{i}"
        wqkv = np.asarray(sd[f"{p}.attention.wqkv.weight"])  # (out, h)
        h = wqkv.shape[1]
        w = wqkv.reshape(num_kv_heads, q_per_kv + 2, head_dim, h)
        wq = w[:, :q_per_kv].reshape(num_heads * head_dim, h)
        wk = w[:, q_per_kv].reshape(num_kv_heads * head_dim, h)
        wv = w[:, q_per_kv + 1].reshape(num_kv_heads * head_dim, h)
        return {
            "input_layernorm": _ln(sd, f"{p}.attention_norm"),
            "post_attention_layernorm": _ln(sd, f"{p}.ffn_norm"),
            "attn": {
                "wq": {"kernel": _dev(wq.T)},
                "wk": {"kernel": _dev(wk.T)},
                "wv": {"kernel": _dev(wv.T)},
                "wo": _linear(sd, f"{p}.attention.wo"),
            },
            "mlp": {
                "gate": _linear(sd, f"{p}.feed_forward.w1"),
                "up": _linear(sd, f"{p}.feed_forward.w3"),
                "down": _linear(sd, f"{p}.feed_forward.w2"),
            },
        }

    return {
        "embed_tokens": {
            "embedding": _dev(
                np.asarray(sd[f"{prefix}.tok_embeddings.weight"])
            )
        },
        "layers_scanned": _stack(layer, n_layers, path="lm/layers_scanned"),
        "norm": _ln(sd, f"{prefix}.norm"),
        "lm_head": {"kernel": _dev(_t(sd["output.weight"]))},
    }


# ───────────────────────── vision towers ─────────────────────────


def port_clip_vit(sd: StateDict, n_layers: int, prefix: str) -> PyTree:
    """HF CLIPVisionModel (llava/llava-next/instructblip towers)."""

    def layer(i):
        p = f"{prefix}.encoder.layers.{i}"
        return {
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "attn": {
                "wq": _linear(sd, f"{p}.self_attn.q_proj"),
                "wk": _linear(sd, f"{p}.self_attn.k_proj"),
                "wv": _linear(sd, f"{p}.self_attn.v_proj"),
                "wo": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }

    emb = f"{prefix}.embeddings"
    out = {
        "patch_embed": {
            "kernel": _dev(_conv(sd[f"{emb}.patch_embedding.weight"]))
        },
        "pos_embed": {
            "embedding": _dev(
                np.asarray(sd[f"{emb}.position_embedding.weight"])
            )
        },
        "cls": {"token": _dev(np.asarray(sd[f"{emb}.class_embedding"]))},
        "layers_scanned": _stack(layer, n_layers, path="vision/layers_scanned"),
    }
    if f"{emb}.patch_embedding.bias" in sd:
        out["patch_embed"]["bias"] = _dev(
            np.asarray(sd[f"{emb}.patch_embedding.bias"])
        )
    if f"{prefix}.pre_layrnorm.weight" in sd:  # HF CLIP's (sic) spelling
        out["ln_pre"] = _ln(sd, f"{prefix}.pre_layrnorm")
    if f"{prefix}.post_layernorm.weight" in sd:
        out["ln_post"] = _ln(sd, f"{prefix}.post_layernorm")
    return out


def port_qwen_visual(
    sd: StateDict,
    n_layers: int,
    prefix: str = "transformer.visual",
    vis_heads: int = 16,
) -> tuple[PyTree, PyTree]:
    """Qwen ViT-bigG + Resampler. Returns (vision_tree, projector_tree)."""

    def layer(i):
        p = f"{prefix}.transformer.resblocks.{i}"
        # VisualAttention.in_proj rows are PER-HEAD interleaved [q;k;v]
        # (visual.py:160-205: view(..., np, 3*hn).split(hn)), unlike
        # nn.MultiheadAttention's block layout.
        in_w = np.asarray(sd[f"{p}.attn.in_proj.weight"])
        in_b = np.asarray(sd[f"{p}.attn.in_proj.bias"])
        d, h = in_w.shape[0] // 3, in_w.shape[1]
        nh = vis_heads
        hd = d // nh
        w = in_w.reshape(nh, 3, hd, h)
        b_ = in_b.reshape(nh, 3, hd)
        wq, wk, wv = (w[:, j].reshape(d, h) for j in range(3))
        bq, bk, bv = (b_[:, j].reshape(d) for j in range(3))
        return {
            "ln1": _ln(sd, f"{p}.ln_1"),
            "ln2": _ln(sd, f"{p}.ln_2"),
            "attn": {
                "wq": {"kernel": _dev(wq.T), "bias": _dev(bq)},
                "wk": {"kernel": _dev(wk.T), "bias": _dev(bk)},
                "wv": {"kernel": _dev(wv.T), "bias": _dev(bv)},
                "wo": _linear(sd, f"{p}.attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.c_fc"),
                "fc2": _linear(sd, f"{p}.mlp.c_proj"),
            },
        }

    vision = {
        "patch_embed": {"kernel": _dev(_conv(sd[f"{prefix}.conv1.weight"]))},
        "pos_embed": {
            "embedding": _dev(np.asarray(sd[f"{prefix}.positional_embedding"]))
        },
        "ln_pre": _ln(sd, f"{prefix}.ln_pre"),
        "layers_scanned": _stack(layer, n_layers, path="vision/layers_scanned"),
    }
    ap = f"{prefix}.attn_pool"
    in_w = np.asarray(sd[f"{ap}.attn.in_proj_weight"])
    in_b = np.asarray(sd[f"{ap}.attn.in_proj_bias"])
    wq, wk, wv = np.split(in_w, 3, axis=0)
    bq, bk, bv = np.split(in_b, 3, axis=0)
    resampler = {
        "query": _dev(np.asarray(sd[f"{ap}.query"])),
        "pos_embed": _dev(np.asarray(sd[f"{ap}.pos_embed"])),
        "ln_q": _ln(sd, f"{ap}.ln_q"),
        "ln_kv": _ln(sd, f"{ap}.ln_kv"),
        "kv_proj": _linear(sd, f"{ap}.kv_proj"),
        "attn": {
            "wq": {"kernel": _dev(wq.T), "bias": _dev(bq)},
            "wk": {"kernel": _dev(wk.T), "bias": _dev(bk)},
            "wv": {"kernel": _dev(wv.T), "bias": _dev(bv)},
            "wo": _linear(sd, f"{ap}.attn.out_proj"),
        },
    }
    projector = {
        "resampler": resampler,
        "ln_post": _ln(sd, f"{prefix}.ln_post"),
        "proj": {"kernel": _dev(np.asarray(sd[f"{prefix}.proj"]))},
    }
    return vision, projector


# ───────────────────────── assembled models ─────────────────────────


def _normalize_llava_keys(sd: StateDict) -> StateDict:
    """Map transformers>=4.52 key layout (model.language_model.*, lm_head.*)
    back to the 4.41-era layout the reference pins (language_model.model.*)."""
    if not any(k.startswith("model.language_model.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            k = "language_model.model." + k[len("model.language_model.") :]
        elif k == "lm_head.weight":
            k = "language_model.lm_head.weight"
        elif k == "model.image_newline":
            k = "image_newline"
        elif k.startswith("model."):
            k = k[len("model.") :]
        out[k] = v
    return out


def port_llava(sd: StateDict, cfg: VLMConfig) -> PyTree:
    """HF LlavaForConditionalGeneration / LlavaNextForConditionalGeneration
    (the latter additionally carries image_newline for anyres packing)."""
    sd = _normalize_llava_keys(sd)
    lm = port_llama_lm(sd, cfg.lm.num_layers, "language_model.model")
    if "lm_head" not in lm:
        lm["lm_head"] = {
            "kernel": _dev(_t(sd["language_model.lm_head.weight"]))
        }
    out = {
        "vision": port_clip_vit(
            sd, cfg.vision.num_layers, "vision_tower.vision_model"
        ),
        "projector": {
            "fc1": _linear(sd, "multi_modal_projector.linear_1"),
            "fc2": _linear(sd, "multi_modal_projector.linear_2"),
        },
        "lm": lm,
    }
    if "image_newline" in sd:
        out["image_newline"] = {
            "embedding": _dev(np.asarray(sd["image_newline"]))
        }
    return out


def port_qwen_vl(sd: StateDict, cfg: VLMConfig) -> PyTree:
    vision, projector = port_qwen_visual(
        sd, cfg.vision.num_layers, vis_heads=cfg.vision.num_heads
    )
    return {
        "vision": vision,
        "projector": projector,
        "lm": port_qwen_lm(sd, cfg.lm.num_layers),
    }


def port_internlm_xc2(sd: StateDict, cfg: VLMConfig) -> PyTree:
    """XC2: CLIP tower under vit.vision_tower.vision_model, 2-layer
    vision_proj, InternLM2 LM (+ built-in trained PLoRA weights — ported
    separately via port_xc2_plora)."""
    return {
        "vision": port_clip_vit(
            sd, cfg.vision.num_layers, "vit.vision_tower.vision_model"
        ),
        "projector": {
            "fc1": _linear(sd, "vision_proj.0"),
            "fc2": _linear(sd, "vision_proj.2"),
        },
        "lm": port_internlm2_lm(
            sd,
            cfg.lm.num_layers,
            cfg.lm.num_heads,
            cfg.lm.num_kv_heads,
            cfg.lm.head_dim_,
        ),
    }


def port_xc2_plora(sd: StateDict, cfg: VLMConfig) -> PyTree:
    """XC2 ships TRAINED PLoRA weights (Plora_A/Plora_B on wqkv and wo and
    feed_forward, build_mlp.py:158-203). Ported as an adapter tree gated by
    im_mask. The fused-wqkv PLoRA maps to separate per-projection adapters
    sharing the A matrix."""
    q_per_kv = cfg.lm.num_heads // cfg.lm.num_kv_heads
    hd = cfg.lm.head_dim_
    nkv = cfg.lm.num_kv_heads

    def layer(i):
        p = f"model.layers.{i}"
        out = {}
        wqkv_a = sd.get(f"{p}.attention.wqkv.Plora_A.weight")
        if wqkv_a is None:
            return None
        a = _dev(_t(wqkv_a))  # (h, r)
        b_full = np.asarray(sd[f"{p}.attention.wqkv.Plora_B.weight"])  # (out, r)
        r = b_full.shape[1]
        b = b_full.reshape(nkv, q_per_kv + 2, hd, r)
        bq = b[:, :q_per_kv].reshape(-1, r).T
        bk = b[:, q_per_kv].reshape(-1, r).T
        bv = b[:, q_per_kv + 1].reshape(-1, r).T
        out["attn"] = {
            "wq": {"a": a, "b": _dev(bq)},
            "wk": {"a": a, "b": _dev(bk)},
            "wv": {"a": a, "b": _dev(bv)},
            "wo": {
                "a": _dev(_t(sd[f"{p}.attention.wo.Plora_A.weight"])),
                "b": _dev(_t(sd[f"{p}.attention.wo.Plora_B.weight"])),
            },
        }
        out["mlp"] = {
            "gate": {
                "a": _dev(_t(sd[f"{p}.feed_forward.w1.Plora_A.weight"])),
                "b": _dev(_t(sd[f"{p}.feed_forward.w1.Plora_B.weight"])),
            },
            "up": {
                "a": _dev(_t(sd[f"{p}.feed_forward.w3.Plora_A.weight"])),
                "b": _dev(_t(sd[f"{p}.feed_forward.w3.Plora_B.weight"])),
            },
            "down": {
                "a": _dev(_t(sd[f"{p}.feed_forward.w2.Plora_A.weight"])),
                "b": _dev(_t(sd[f"{p}.feed_forward.w2.Plora_B.weight"])),
            },
        }
        return out

    layers = [layer(i) for i in range(cfg.lm.num_layers)]
    if layers[0] is None:
        return {}
    import jax

    return {"lm": {"layers_scanned": _stack_trees(layers)}}


def port_instructblip_vit(sd: StateDict, n_layers: int, prefix: str) -> PyTree:
    """HF InstructBlipVisionModel: fused qkv (block split), raw-Parameter
    class/position embeddings, no pre-LN."""

    def layer(i):
        p = f"{prefix}.encoder.layers.{i}"
        qkv_w = np.asarray(sd[f"{p}.self_attn.qkv.weight"])
        qkv_b = np.asarray(sd[f"{p}.self_attn.qkv.bias"])
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        return {
            "ln1": _ln(sd, f"{p}.layer_norm1"),
            "ln2": _ln(sd, f"{p}.layer_norm2"),
            "attn": {
                "wq": {"kernel": _dev(wq.T), "bias": _dev(bq)},
                "wk": {"kernel": _dev(wk.T), "bias": _dev(bk)},
                "wv": {"kernel": _dev(wv.T), "bias": _dev(bv)},
                "wo": _linear(sd, f"{p}.self_attn.projection"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }

    emb = f"{prefix}.embeddings"
    return {
        "patch_embed": {
            "kernel": _dev(_conv(sd[f"{emb}.patch_embedding.weight"])),
            "bias": _dev(np.asarray(sd[f"{emb}.patch_embedding.bias"])),
        },
        "pos_embed": {
            "embedding": _dev(np.asarray(sd[f"{emb}.position_embedding"]))[0]
        },
        "cls": {
            "token": _dev(np.asarray(sd[f"{emb}.class_embedding"]))[0, 0]
        },
        "layers_scanned": _stack(layer, n_layers, path="vision/layers_scanned"),
        "ln_post": _ln(sd, f"{prefix}.post_layernorm"),
    }


def port_instructblip(sd: StateDict, cfg: VLMConfig) -> PyTree:
    """HF InstructBlipForConditionalGeneration."""
    qcfg = cfg.qformer

    def qlayer(i):
        p = f"qformer.encoder.layer.{i}"

        def bert_attn(ap, out_p):
            return {
                "wq": _linear(sd, f"{ap}.query"),
                "wk": _linear(sd, f"{ap}.key"),
                "wv": _linear(sd, f"{ap}.value"),
                "wo": _linear(sd, f"{out_p}.dense"),
                "ln": _ln(sd, f"{out_p}.LayerNorm"),
            }

        layer = {
            "self_attn": bert_attn(
                f"{p}.attention.attention", f"{p}.attention.output"
            ),
            "ffn": {
                "fc1": _linear(sd, f"{p}.intermediate.dense"),
                "fc2": _linear(sd, f"{p}.output.dense"),
                "ln": _ln(sd, f"{p}.output.LayerNorm"),
            },
            "ffn_query": {
                "fc1": _linear(sd, f"{p}.intermediate_query.dense"),
                "fc2": _linear(sd, f"{p}.output_query.dense"),
                "ln": _ln(sd, f"{p}.output_query.LayerNorm"),
            },
        }
        if f"{p}.crossattention.attention.query.weight" in sd:
            layer["cross_attn"] = bert_attn(
                f"{p}.crossattention.attention", f"{p}.crossattention.output"
            )
        return layer

    qformer = {
        "query_tokens": _dev(np.asarray(sd["query_tokens"]))[0],
        "embeddings": {
            "word": {
                "embedding": _dev(
                    np.asarray(sd["qformer.embeddings.word_embeddings.weight"])
                )
            },
            "position": {
                "embedding": _dev(
                    np.asarray(
                        sd["qformer.embeddings.position_embeddings.weight"]
                    )
                )
            },
            "ln": _ln(sd, "qformer.embeddings.layernorm"),
        },
        "layers": [qlayer(i) for i in range(qcfg.num_layers)],
    }
    lm = port_llama_lm(sd, cfg.lm.num_layers, "language_model.model")
    if "lm_head" not in lm:
        lm["lm_head"] = {
            "kernel": _dev(_t(sd["language_model.lm_head.weight"]))
        }
    return {
        "vision": port_instructblip_vit(sd, cfg.vision.num_layers, "vision_model"),
        "qformer": qformer,
        "projector": {"fc1": _linear(sd, "language_projection")},
        "lm": lm,
    }


# ───────────────────────── loading from disk ─────────────────────────


class LazyStateDict(Mapping):
    """Streaming state-dict view over a sharded checkpoint dir.

    safetensors: a key -> shard index is built from file HEADERS only;
    each __getitem__ reads exactly one tensor (mmap slice). This bounds the
    host RSS of a 7B+ port to ~one tensor + OS page cache instead of 3x
    model bytes (round 2 loaded every shard eagerly; the reference leans on
    HF sharded from_pretrained, auto_load.py:64-93).

    torch .bin fallback: shards cannot be random-accessed, so one shard is
    resident at a time (single-entry cache) — still ~1 shard of RSS, not
    the full model.
    """

    def __init__(self, path: str):
        import glob
        import os

        self._handles: dict = {}
        self._index: dict[str, str] = {}
        self._torch_cache: tuple = (None, None)
        st = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st:
            from safetensors import safe_open

            for f in st:
                h = safe_open(f, framework="numpy")
                self._handles[f] = h
                for k in h.keys():
                    self._index[k] = f
            return
        bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
        if not bins:
            raise FileNotFoundError(f"no weights found under {path}")
        import torch

        for f in bins:
            try:  # meta map_location: index keys without reading data
                part = torch.load(
                    f, map_location="meta", weights_only=True
                )
            except Exception:
                part = torch.load(f, map_location="cpu", weights_only=True)
            for k in part:
                self._index[k] = f

    def __getitem__(self, k: str):
        f = self._index[k]
        if self._handles:
            return self._handles[f].get_tensor(k)
        if self._torch_cache[0] != f:
            import torch

            self._torch_cache = (
                f, torch.load(f, map_location="cpu", weights_only=True)
            )
        return self._torch_cache[1][k].float().numpy()

    def __iter__(self):
        return iter(self._index)

    def __len__(self):
        return len(self._index)


def open_hf_state_dict(path: str) -> LazyStateDict:
    """Streaming open (the production load path): per-tensor mmap reads."""
    return LazyStateDict(path)


def load_hf_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load all safetensors/torch shards under a checkpoint dir into numpy."""
    import glob
    import os

    sd: dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(f))
        return sd
    import torch

    for f in sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))):
        part = torch.load(f, map_location="cpu", weights_only=True)
        sd.update({k: v.float().numpy() for k, v in part.items()})
    if not sd:
        raise FileNotFoundError(f"no weights found under {path}")
    return sd


PORTERS = {
    "llava": port_llava,
    "llava_next_vicuna": port_llava,
    "llava_next_mistral": port_llava,
    "qwen_vl": port_qwen_vl,
    "internlm_xc2": port_internlm_xc2,
    "instructblip": port_instructblip,
}


def cast_tree(tree: PyTree, dtype) -> PyTree:
    import jax

    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != dtype
        else x,
        tree,
    )
