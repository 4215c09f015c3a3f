"""GPipe-style pipeline parallelism over the `pipe` mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2.3: absent — its
scaling story stops at DeepSpeed ZeRO-3, accelerate_config/zero3.yaml).
This is the TPU-native extension for stacks whose layers exceed one chip's
HBM even under FSDP, and for meshes where an extra ICI dimension is better
spent on depth than on more parameter sharding:

  - the stacked decoder params (L, ...) reshape to (S, L/S, ...) with the
    stage axis laid over `pipe` (core/partitioning.py puts `pipe` on the
    leading layer axis when the mesh has pipe > 1, so each stage's chips
    hold ONLY their L/S layers);
  - the batch splits into M microbatches that flow GPipe-style: at step t,
    stage s runs microbatch t - s; activations hop one stage per step via
    a single ppermute. Bubble fraction (S-1)/(M+S-1).

shard_map is manual ONLY over `pipe` (axis_names={'pipe'}); data/fsdp/model
stay *auto*, so GSPMD keeps sharding the within-stage math (rows over
data×fsdp, heads/ffn over model) exactly as the non-pipelined step does —
PP composes with FSDP/TP/DP rather than replacing them. Attention inside
the stage body runs the XLA path (ctx.attn_impl='xla'): the Pallas flash
dispatch re-enters its own full-mesh shard_map (ops/attention.py), which
cannot nest inside this manual region.

Per-microbatch metadata (rope cos/sin, pad/segment masks, PLoRA lora_mask)
is NOT ppermuted with the activations: every stage derives its current
microbatch index mb = clip(t - stage_id, 0, M-1) and indexes the replicated
metadata locally — only the (b/M, S, H) hidden state rides the ICI hop.

Training forward only (no KV cache); generation under a pipe>1 mesh runs
the plain scanned path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.ops.norms import rms_norm

PyTree = Any


def _stage_view(tree: PyTree, s: int, lps: int) -> PyTree:
    """(L, ...) stacked leaves -> (S, L/S, ...)."""
    if tree is None:
        return None
    return jax.tree.map(
        lambda a: a.reshape((s, lps) + a.shape[1:]), tree
    )


def _microbatch(x: Optional[jax.Array], m: int) -> Optional[jax.Array]:
    if x is None:
        return None
    b = x.shape[0]
    return x.reshape((m, b // m) + x.shape[1:])


def pipeline_decoder(
    cfg,
    stacked_params: PyTree,  # params["layers_scanned"], leaves (L, ...)
    layer_ctx: Ctx,  # ctx.sub("layers_scanned") — adapters stacked (L, ...)
    inputs_embeds: jax.Array,  # (B, S_seq, H)
    cos: jax.Array,  # (B, S_seq, hd)
    sin: jax.Array,
    pad_mask: Optional[jax.Array],  # (B, S_seq)
    segment_ids: Optional[jax.Array],
    positions: jax.Array,  # (B, S_seq)
) -> jax.Array:
    """Run the decoder stack pipelined; returns hidden states (B, S_seq, H)
    replicated over `pipe` (identical math to the plain scan — the grad
    parity test pins it)."""
    from vlrlhf_tpu.core.mesh import get_global_mesh
    from vlrlhf_tpu.models.lm.llama import (
        _attention_block,
        _mlp_block,
        remat_policy_for,
    )

    assert not cfg.sequence_parallel_axis, (
        "pipeline parallelism and ring-attention sequence parallelism are "
        "mutually exclusive: the SP branch opens its own full-mesh "
        "shard_map, which cannot nest inside the pipe-manual region"
    )
    mesh = get_global_mesh()
    s_pipe = dict(mesh.shape).get("pipe", 1)
    assert s_pipe == cfg.pipeline_stages, (
        f"cfg.pipeline_stages={cfg.pipeline_stages} but mesh pipe axis has "
        f"{s_pipe} devices"
    )
    n_l = cfg.num_layers
    assert n_l % s_pipe == 0, (n_l, s_pipe)
    lps = n_l // s_pipe
    m = cfg.pipeline_microbatches or s_pipe
    b = inputs_embeds.shape[0]
    assert b % m == 0, (
        f"batch {b} not divisible into {m} pipeline microbatches"
    )

    p_st = _stage_view(stacked_params, s_pipe, lps)
    ad_st = _stage_view(layer_ctx.adapters, s_pipe, lps)
    bad_st = _stage_view(layer_ctx.base_adapters, s_pipe, lps)
    x_mb = _microbatch(inputs_embeds, m)
    meta = {
        "cos": _microbatch(cos, m),
        "sin": _microbatch(sin, m),
        "pad": _microbatch(pad_mask, m),
        "seg": _microbatch(segment_ids, m),
        "pos": _microbatch(positions, m),
        "lmask": _microbatch(layer_ctx.lora_mask, m),
    }

    def run(p_st, ad_st, bad_st, x_mb, meta):
        sid = jax.lax.axis_index("pipe")
        take0 = lambda t: None if t is None else jax.tree.map(  # noqa: E731
            lambda a: a[0], t
        )
        p_loc, ad_loc, bad_loc = take0(p_st), take0(ad_st), take0(bad_st)

        def pick(x, mb_i):
            return None if x is None else jax.lax.dynamic_index_in_dim(
                x, mb_i, 0, keepdims=False
            )

        def stage_apply(h, mb_i):
            cos_i, sin_i = pick(meta["cos"], mb_i), pick(meta["sin"], mb_i)
            pad_i = pick(meta["pad"], mb_i)
            seg_i = pick(meta["seg"], mb_i)
            pos_i = pick(meta["pos"], mb_i)
            lmask_i = pick(meta["lmask"], mb_i)
            base_ctx = dataclasses.replace(
                layer_ctx, adapters=None, base_adapters=None,
                lora_mask=lmask_i, attn_impl="xla",
            )

            def body(x, xs):
                lp, la, lba, li = xs
                rng = base_ctx.dropout_rng
                if rng is not None:
                    # distinct LoRA-dropout stream per GLOBAL layer index,
                    # matching lm_forward's fold
                    rng = jax.random.fold_in(rng, li)
                lctx = dataclasses.replace(
                    base_ctx, adapters=la, base_adapters=lba,
                    dropout_rng=rng,
                )
                h1 = rms_norm(
                    x, lp["input_layernorm"]["weight"], cfg.rms_eps
                )
                attn_out, _ = _attention_block(
                    cfg, lp["attn"], lctx.sub("attn"), h1, cos_i, sin_i,
                    pad_i, seg_i, pos_i, None, None,
                )
                x = x + attn_out
                h1 = rms_norm(
                    x, lp["post_attention_layernorm"]["weight"],
                    cfg.rms_eps,
                )
                x = x + _mlp_block(lp["mlp"], lctx.sub("mlp"), h1)
                return x, None

            if cfg.remat:
                body = jax.checkpoint(
                    body, prevent_cse=False, policy=remat_policy_for(cfg)
                )
            xs = (p_loc, ad_loc, bad_loc, sid * lps + jnp.arange(lps))
            h, _ = jax.lax.scan(body, h, xs)
            return h

        perm = [(i, (i + 1) % s_pipe) for i in range(s_pipe)]

        def step(carry, t):
            h_prev, outputs = carry
            recv = jax.lax.ppermute(h_prev, "pipe", perm)
            feed = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h_in = jnp.where(sid == 0, feed, recv)
            mb_i = jnp.clip(t - sid, 0, m - 1)
            h_out = stage_apply(h_in, mb_i)
            out_i = t - (s_pipe - 1)
            write = (sid == s_pipe - 1) & (out_i >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, h_out, jnp.clip(out_i, 0, m - 1), 0
            )
            outputs = jnp.where(write, upd, outputs)
            return (h_out, outputs), None

        h0 = jnp.zeros_like(x_mb[0])
        (_, outputs), _ = jax.lax.scan(
            step, (h0, jnp.zeros_like(x_mb)), jnp.arange(m + s_pipe - 1)
        )
        # only the last stage holds real outputs; psum over `pipe`
        # replicates them so the (auto-sharded) head math that follows sees
        # one consistent value everywhere
        outputs = jax.lax.psum(
            jnp.where(sid == s_pipe - 1, outputs, jnp.zeros_like(outputs)),
            "pipe",
        )
        return outputs

    spec_pipe = lambda t: jax.tree.map(lambda _: P("pipe"), t)  # noqa: E731
    spec_rep = lambda t: jax.tree.map(lambda _: P(), t)  # noqa: E731
    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            spec_pipe(p_st), spec_pipe(ad_st), spec_pipe(bad_st),
            P(), spec_rep(meta),
        ),
        out_specs=P(),
        axis_names=frozenset({"pipe"}),
        check_vma=False,
    )
    out_mb = fn(p_st, ad_st, bad_st, x_mb, meta)
    return out_mb.reshape((b,) + out_mb.shape[2:])
