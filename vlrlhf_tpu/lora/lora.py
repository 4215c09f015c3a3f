"""LoRA adapters as separate param pytrees (replaces peft).

Design (SURVEY.md §7.1.4): adapters live in their OWN pytree mirroring the
base-param tree structure — a leaf is a dict {"a": (in, r), "b": (r, out)}.
The reference policy in DPO is the base model with adapters disabled (the
reference relies on TRL's `null_ref_context` for this,
/root/reference/src/vlrlhf/base/trainer.py:190-242); here adapter-off is just
`adapters=None` on a second call inside the same jitted step, so the ref
forward is guaranteed bit-identical to the frozen base.

PLoRA (InternLM-XComposer2's partial LoRA, applied only at image positions —
/root/reference/src/vlrlhf/models/InternLMXC2/build_mlp.py:158-203) is the
`mask` argument of `lora_delta`: delta is zeroed where mask == 0.

Named adapter sets (value adapter / reward adapter for PPO,
/root/reference/src/vlrlhf/base/model.py:72-139) are simply separate adapter
pytrees over the same base params.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from vlrlhf_tpu.core.partitioning import tree_paths

PyTree = Any


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: float = 16.0
    dropout: float = 0.05
    # Regex patterns over param paths selecting target linears ("auto" per
    # model family resolves to its default_lora_targets before this is built).
    target_patterns: tuple[str, ...] = ()
    # PLoRA: apply delta only where the position mask is set.
    masked: bool = False

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def match_lora_targets(
    params: PyTree, patterns: Sequence[str]
) -> list[str]:
    """Paths of 'kernel' leaves whose path matches any target pattern."""
    regs = [re.compile(p) for p in patterns]
    out = []
    for path, leaf in tree_paths(params):
        # kernel_q / kernel_q4: quantized frozen base (QLoRA mode,
        # ops/quant.py int8 / ops/int4.py group-wise int4)
        if path.endswith("/kernel_q"):
            path = path[: -len("_q")]
        elif path.endswith("/kernel_q4"):
            path = path[: -len("_q4")]
        elif not path.endswith("/kernel"):
            continue
        if getattr(leaf, "ndim", 0) != 2 and "_scanned" not in path:
            continue
        if any(r.search(path) for r in regs):
            out.append(path)
    return out


def _set_path(tree: dict, parts: list[str], value: Any) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def init_lora(
    params: PyTree,
    config: LoraConfig,
    rng: jax.Array,
    dtype: jnp.dtype = jnp.float32,
) -> PyTree:
    """Build the adapter pytree: for each matched kernel, {"a","b"}.

    a ~ N(0, 1/r) (kaiming-ish), b = 0 so the adapted model starts identical
    to the base — required for the DPO policy == ref at step 0 invariant.

    Scanned kernels (leading layer axis) get per-layer adapters stacked on
    the same leading axis.
    """
    targets = match_lora_targets(params, config.target_patterns)
    flat = dict(tree_paths(params))
    adapters: dict = {}
    keys = jax.random.split(rng, max(len(targets), 1))
    for key, path in zip(keys, sorted(targets)):
        true_in = None
        if path in flat:
            kernel = flat[path]
        elif path + "_q" in flat:
            kernel = flat[path + "_q"]
        else:
            # int4: packed rows are `in`-padded (ops/int4.py representation)
            # — the true input width comes from the group-scale row count
            kernel = flat[path + "_q4"]
            s_rows = flat[path + "_scale"].shape[-2]
            true_in = 64 * (s_rows - s_rows % 2)
        if "_scanned" in path and kernel.ndim == 3:
            n_layers, d_in, d_out = kernel.shape
            d_in = true_in or d_in
            a = jax.random.normal(key, (n_layers, d_in, config.r), dtype) / (
                config.r**0.5
            )
            b = jnp.zeros((n_layers, config.r, d_out), dtype)
        else:
            d_in, d_out = kernel.shape
            d_in = true_in or d_in
            a = jax.random.normal(key, (d_in, config.r), dtype) / config.r**0.5
            b = jnp.zeros((config.r, d_out), dtype)
        parts = path.split("/")[:-1]  # drop the trailing 'kernel'
        _set_path(adapters, parts, {"a": a, "b": b})
    return adapters


def lora_delta(
    x: jax.Array,
    adapter: Optional[dict],
    scale: float,
    mask: Optional[jax.Array] = None,  # (..., seq) 1 = apply (PLoRA im_mask)
    dropout_rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
    mix: Optional[jax.Array] = None,  # (B, N) multi-adapter mixing weights
    # over sets stacked by stack_adapter_sets; each set's delta is read/
    # computed ONCE per call (not per row) and combined by the mix matmul
    # — N stays small (serving registry), so the extra bandwidth is
    # N x adapter bytes, not B x.
) -> jax.Array | None:
    """delta = dropout(x) @ a @ b * scale, optionally position-masked."""
    if adapter is None:
        return None
    h = x
    if dropout_rng is not None and dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, x.shape)
        h = jnp.where(keep, x / (1.0 - dropout), 0.0)
    a = adapter["a"].astype(x.dtype)
    b = adapter["b"].astype(x.dtype)
    if mix is not None:
        if mix.shape[0] != h.shape[0]:
            raise ValueError(
                f"adapter_mix has {mix.shape[0]} rows but this module's "
                f"batch is {h.shape[0]} — multi-adapter serving supports "
                "LM-path adapters only (a vision tower's batch is images/"
                "tiles, not request rows)"
            )
        # a (in, N, r), b (N*r, out), h (B, S, in), mix (B, N) — the sets
        # are stacked on INNER axes (stack_adapter_sets) so the N-set delta
        # is TWO dense MXU matmuls at the N*r contraction width, exactly
        # like a single rank-N*r adapter, with the mix applied as a free
        # elementwise mask between them:
        #   delta_b = sum_n mix_bn * (h_b @ a_n) @ b_n
        # The first cut used three nbsr einsums; at decode shapes (S=1)
        # those lowered to ~3 tiny ops per target x 7 targets x 32 layers
        # and the 4-set serving tax measured ~2x end-to-end — op-count
        # latency, not the N x adapter-bytes bandwidth this should cost.
        d_in, n, r = a.shape
        t = h @ a.reshape(d_in, n * r)  # (B, S, N*r)
        t = t.reshape(*t.shape[:-1], n, r) * mix.astype(x.dtype)[
            :, None, :, None
        ]
        delta = t.reshape(*h.shape[:-1], n * r) @ b * scale
    else:
        delta = (h @ a) @ b * scale
    if mask is not None:
        delta = delta * mask[..., None].astype(delta.dtype)
    return delta


def stack_adapter_sets(sets: Sequence[PyTree]) -> PyTree:
    """Stack N adapter pytrees for multi-adapter serving (Ctx.adapter_mix).

    Layout is chosen so lora_delta's mixed path is two DENSE matmuls (see
    its comment): 'a' leaves (in, r) stack on the INNER axis to (in, N, r)
    — contiguous (in, N*r) after reshape — and 'b' leaves (r, out) stack
    flattened to (N*r, out). SCANNED leaves (leading layer axis, path
    contains '_scanned') keep the layer axis first: (L, in, N, r) /
    (L, N*r, out), so the decoder's per-layer slice still strips axis 0.
    All sets must share structure and shapes (same LoraConfig
    targets/rank)."""
    import jax.tree_util as jtu

    flat0, treedef = jtu.tree_flatten_with_path(sets[0])
    flats = [jtu.tree_flatten_with_path(s)[0] for s in sets]
    leaves = []
    for i, (keypath, _) in enumerate(flat0):
        path = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        scanned = "_scanned" in path
        stack = [f[i][1] for f in flats]
        n = len(stack)
        if path.endswith("/a") or path.rsplit("/", 1)[-1] == "a":
            # (in, r) -> (in, N, r); scanned (L, in, r) -> (L, in, N, r)
            leaves.append(jnp.stack(stack, axis=2 if scanned else 1))
        else:
            # (r, out) -> (N*r, out); scanned (L, r, out) -> (L, N*r, out)
            st = jnp.stack(stack, axis=1 if scanned else 0)
            if scanned:
                L, _, r, out = st.shape
                leaves.append(st.reshape(L, n * r, out))
            else:
                _, r, out = st.shape
                leaves.append(st.reshape(n * r, out))
    return jtu.tree_unflatten(treedef, leaves)


def fuse_adapter_sets(adapters: PyTree, n_sets: int = 1) -> PyTree:
    """Rewrite an adapter tree to the FUSED serving layout, mirroring
    models/lm/fuse.fuse_lm_params: attn {wq,wk,wv} -> {wqkv}, mlp
    {gate,up} -> {gateup}.

    Why: decode at small batch is op-count-bound, not bandwidth-bound —
    one r=64 set adds 32 layers x 7 targets x 2 tiny matmuls per step
    while streaming only ~470 MB (same-window r5 chip A/B: 1.27x serving
    tax unfused, tools/r5_sweep_results.log [r5 serve_adapters_fused]).
    Fusing the three qkv (and two gate/up) deltas into one A-matmul + one
    block-diagonal B-matmul cuts the per-layer adapter ops 14 -> 8
    (+7% measured at N=1 on top of the +21% base wqkv fusion). Exact:
    the A-side concatenation leaves every reduction over `in` untouched;
    the B-side block diagonal adds only structural zeros.

    Layout per fusion group of T targets (works for single sets and for
    trees stacked by stack_adapter_sets — pass that call's N as n_sets):
      a: concat along the rank axis -> (..., in, [N,] T*r)
      b: per-set block diagonal     -> (..., [N*]T*r, sum(out_t))
    so lora_delta's plain AND mixed paths apply unchanged under the key
    "wqkv"/"gateup" (the fused base branches in models/lm/llama.py pick
    them up via ctx.sub). Only lm/layers_scanned is rewritten; any other
    subtree (vision towers, unscanned modules) passes through. Groups
    fuse only when ALL their targets carry adapters of equal rank —
    otherwise they stay per-target (the fused forward branches keep the
    per-name fallback for exactly this case, and for built-in PLoRA)."""
    lm = adapters.get("lm") if isinstance(adapters, dict) else None
    if not isinstance(lm, dict) or "layers_scanned" not in lm:
        return adapters
    layers = lm["layers_scanned"]

    def fusable(sub: dict, names: tuple) -> bool:
        mods = [sub.get(n) for n in names]
        if not all(isinstance(m, dict) and "a" in m for m in mods):
            return False
        ranks = {m["a"].shape[-1] for m in mods}
        return len(ranks) == 1

    def fuse_group(sub: dict, names: tuple, fused_key: str) -> dict:
        mods = [sub[n] for n in names]
        a_cat = jnp.concatenate([m["a"] for m in mods], axis=-1)
        t_n, r = len(mods), mods[0]["a"].shape[-1]
        assert mods[0]["b"].shape[-2] == n_sets * r, (
            f"b rows {mods[0]['b'].shape[-2]} != n_sets*r {n_sets * r} — "
            "pass the stack_adapter_sets N as n_sets"
        )
        outs = [m["b"].shape[-1] for m in mods]
        lead = mods[0]["b"].shape[:-2]
        big = jnp.zeros(
            (*lead, n_sets, t_n * r, sum(outs)), mods[0]["b"].dtype
        )
        off = 0
        for t, m in enumerate(mods):
            v = m["b"].reshape(*lead, n_sets, r, m["b"].shape[-1])
            big = big.at[
                ..., t * r : (t + 1) * r, off : off + v.shape[-1]
            ].set(v)
            off += v.shape[-1]
        out = {
            k: v for k, v in sub.items() if k not in names
        }
        out[fused_key] = {
            "a": a_cat,
            "b": big.reshape(*lead, n_sets * t_n * r, sum(outs)),
        }
        return out

    new_layers = dict(layers)
    attn = layers.get("attn")
    if isinstance(attn, dict) and fusable(attn, ("wq", "wk", "wv")):
        new_layers["attn"] = fuse_group(attn, ("wq", "wk", "wv"), "wqkv")
    mlp = layers.get("mlp")
    if isinstance(mlp, dict) and fusable(mlp, ("gate", "up")):
        new_layers["mlp"] = fuse_group(mlp, ("gate", "up"), "gateup")
    new_lm = dict(lm)
    new_lm["layers_scanned"] = new_layers
    out = dict(adapters)
    out["lm"] = new_lm
    return out


def merge_lora(params: PyTree, adapters: PyTree, scale: float) -> PyTree:
    """Fold adapters into base kernels (the reference's merge_peft_model.py)."""
    flat_adapters = {
        path.rsplit("/", 1)[0]: None for path, _ in tree_paths(adapters)
    }

    def merge_one(path: str, kernel: jax.Array, node: dict) -> jax.Array:
        a, b = node["a"], node["b"]
        if kernel.ndim == 3:  # scanned
            delta = jnp.einsum("lir,lro->lio", a, b) * scale
        else:
            delta = (a @ b) * scale
        return (kernel.astype(jnp.float32) + delta.astype(jnp.float32)).astype(
            kernel.dtype
        )

    # Walk the base tree; wherever adapters has {"a","b"} for module M, merge
    # into M/kernel.
    def walk(base: Any, adpt: Any, path: str) -> Any:
        if isinstance(base, dict):
            out = {}
            for k, v in base.items():
                sub = adpt.get(k) if isinstance(adpt, dict) else None
                child_path = f"{path}/{k}" if path else k
                if (
                    k == "kernel"
                    and isinstance(adpt, dict)
                    and "a" in adpt
                    and "b" in adpt
                ):
                    out[k] = merge_one(child_path, v, adpt)
                else:
                    out[k] = walk(v, sub if sub is not None else {}, child_path)
            return out
        return base

    del flat_adapters
    return walk(params, adapters, "")
