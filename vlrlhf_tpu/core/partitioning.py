"""Parameter partitioning: path-regex -> PartitionSpec rules.

Replaces the reference's DeepSpeed ZeRO-2/3 runtime
(/root/reference/accelerate_config/zero{2,3}.yaml and the gather hooks in
/root/reference/src/vlrlhf/utils/common.py:11-18): instead of a partitioning
runtime with gather hooks, every param leaf is assigned a PartitionSpec by
matching its tree path against an ordered rule list, and XLA/GSPMD inserts all
gathers/reduce-scatters at compile time.

Conventions:
  - Param trees are nested dicts; a leaf path is the '/'-joined key chain,
    e.g. "layers/attn/wq" or "vision/blocks_scanned/mlp/fc1".
  - Rules are (regex, PartitionSpec) pairs, first match wins; no match ==
    fully replicated.
  - Scanned (stacked-over-layers) params have a leading layer axis; rules for
    them must account for it (we prepend None for paths containing a
    '_scanned' marker automatically).
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Mapping, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

SCAN_MARKER = "_scanned"


def tree_paths(tree: PyTree) -> list[tuple[str, Any]]:
    """Flatten a pytree into ('/'-joined path, leaf) pairs."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        out.append(("/".join(parts), leaf))
    return out


class ShardingRules:
    """Ordered (regex, PartitionSpec) rules mapping param paths to shardings.

    pipe_layers=True lays the LM decoder stack's leading layer axis over the
    `pipe` mesh axis (pipeline parallelism, models/lm/pipeline.py) so each
    stage's chips hold only their L/S layers. Vision towers stay unpipelined
    (their `blocks_scanned` axis keeps the None prefix)."""

    def __init__(self, rules: Sequence[tuple[str, P]],
                 pipe_layers: bool = False):
        self.rules = [(re.compile(pat), spec) for pat, spec in rules]
        self.pipe_layers = pipe_layers

    def spec_for(self, path: str, ndim: int | None = None) -> P:
        spec = P()
        for pat, s in self.rules:
            if pat.search(path):
                spec = s
                break
        if SCAN_MARKER in path and spec != P():
            lead = ("pipe" if self.pipe_layers
                    and "layers_scanned" in path else None)
            spec = P(lead, *spec)
        if ndim is not None:
            # Pad/trim the spec to the leaf rank so GSPMD accepts it.
            entries = list(spec)
            if len(entries) > ndim:
                raise ValueError(
                    f"Spec {spec} has more axes than leaf rank {ndim} at {path}"
                )
            entries += [None] * (ndim - len(entries))
            spec = P(*entries)
        return spec

    def tree_specs(self, tree: PyTree) -> PyTree:
        flat = tree_paths(tree)
        specs = [self.spec_for(p, getattr(l, "ndim", 0)) for p, l in flat]
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(treedef, specs)


def logical_to_sharding(spec: P, mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, spec)


def make_sharding(rules: ShardingRules, tree: PyTree, mesh: Mesh) -> PyTree:
    """PyTree of NamedShardings matching `tree`'s structure."""
    specs = rules.tree_specs(tree)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_pytree(rules: ShardingRules, tree: PyTree, mesh: Mesh) -> PyTree:
    """device_put every leaf with its rule-derived NamedSharding."""
    shardings = make_sharding(rules, tree, mesh)
    return jax.tree.map(jax.device_put, tree, shardings)


# Default rule set for llama-style decoders + ViT towers. Matmul weights are
# stored (in_features, out_features); embeddings (vocab, hidden).
#   fsdp  — shard the *larger/input* dim for ZeRO-3-style param sharding
#   model — shard the head/ffn output dim for tensor parallelism
def default_lm_rules(pipe_layers: bool = False) -> ShardingRules:
    return ShardingRules(
        [
            (r"(^|/)embed_tokens/embedding$", P("fsdp", "model")),
            # int8-quantized kernels (ops/quant.py) shard exactly like their
            # bf16 originals; the (1, out) scales follow the out dim.
            # int8 kernel_q shards like its bf16 original; int4 kernel_q4
            # packs nibbles along IN (rows), so row sharding stays valid too
            (r"(^|/)lm_head/kernel(_q4?)?$", P("fsdp", "model")),
            # Attention projections (wqkv = fused serving layout,
            # models/lm/fuse.py — same in/out orientation as its parts)
            (r"attn/(wq|wk|wv|wqkv)/kernel(_q4?)?$", P("fsdp", "model")),
            (r"attn/wo/kernel(_q4?)?$", P("model", "fsdp")),
            # MLP (gateup = fused serving layout)
            (r"mlp/(gate|up|gateup|fc1)/kernel(_q4?)?$", P("fsdp", "model")),
            (r"mlp/(down|fc2)/kernel(_q4?)?$", P("model", "fsdp")),
            (r"(lm_head|attn/(wq|wk|wv|wqkv)|mlp/(gate|up|gateup|fc1))"
             r"/kernel_scale$",
             P(None, "model")),
            (r"(attn/wo|mlp/(down|fc2))/kernel_scale$", P(None, "fsdp")),
            # ingested-GPTQ zero-point bias (utils/gptq.py): (in/64, out) —
            # follows the out dim exactly like the scales
            (r"(lm_head|attn/(wq|wk|wv|wqkv)|mlp/(gate|up|gateup|fc1))"
             r"/kernel_gbias$",
             P(None, "model")),
            (r"(attn/wo|mlp/(down|fc2))/kernel_gbias$", P(None, "fsdp")),
            # LoRA adapters: A maps in->r (shard in on fsdp), B maps r->out
            (r"lora_[^/]*/a$", P("fsdp", None)),
            (r"lora_[^/]*/b$", P(None, "model")),
            # Conv patch embed (H, W, C, D) and biases/norms: replicated
            (r"patch_embed/kernel$", P(None, None, None, "model")),
        ],
        pipe_layers=pipe_layers,
    )


def batch_spec() -> P:
    """Batch sharding: data-parallel over both data and fsdp axes."""
    return P(("data", "fsdp"))


# (B, S) token-stream leaves whose SEQUENCE dim is sharded under sequence
# parallelism; everything else keeps only the batch dim on 'data'.
_SP_SEQ_LEAVES = frozenset({"input_ids", "labels", "pad_mask", "loss_mask"})


def sp_batch_spec(key: str, ndim: int, axis: str = "fsdp") -> P:
    """Per-leaf batch PartitionSpec for sequence-parallel steps: the sp axis
    shards the SEQUENCE of (B, S) token leaves, so the batch dim rides only
    'data'. Feeding sp steps the plain batch_spec() makes XLA involuntarily
    rematerialize (replicate) every (B, S) input at the shard_map boundary —
    the MULTICHIP_r02 warning this fixes."""
    if key in _SP_SEQ_LEAVES and ndim == 2:
        return P("data", axis)
    entries = ["data"] + [None] * (max(ndim, 1) - 1)
    return P(*entries)


def count_params(tree: PyTree) -> int:
    return sum(getattr(x, "size", 0) for x in jax.tree.leaves(tree))
