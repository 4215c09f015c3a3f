"""Pallas TPU flash attention (forward + backward), with segment-id masking.

TPU-native replacement for the reference's flash-attn 2.5.8 CUDA wheels
(/root/reference/src/vlrlhf/utils/auto_load.py:49-56,
 models/InternLMXC2/modeling_internlm2.py:388-494,
 models/QwenVL/modeling_qwen.py:450-467).

Design (see /opt/skills/guides/{pallas_guide,boom_attention_tricks}.md):
  - online softmax, flash-2 style (unnormalized accumulator, one divide at end)
  - grid (batch, heads, q_blocks, kv_blocks); kv innermost, "arbitrary"
  - causal block skipping: KV tiles fully above the diagonal never run
  - segment ids give packed-sequence / DPO-concat masking for free; padding is
    encoded as sentinel segments that never match
  - softmax statistics in f32 VMEM scratch; lse residual saved (B,H,S,LANES)
    replicated across 128 lanes to stay 2D-tiled everywhere
  - backward = two kernels (dkv iterates q-blocks per kv-block; dq the
    reverse), sharing the p = exp(s - lse) recompute; di = sum(o*do) is
    precomputed in XLA

Runs in interpret mode off-TPU so the same kernel logic is unit-tested on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_Q_PAD_SEG = -3  # sentinel segment for padded query rows
_KV_PAD_SEG = -1  # sentinel segment for padded kv rows (never equal to q pad)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ───────────────────────────── forward ─────────────────────────────


def _fwd_kernel(
    seg_q_ref,
    seg_kv_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    qi, ki = pl.program_id(2), pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Skip KV tiles entirely above the causal diagonal.
    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_kv

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, d)
        k = k_ref[0, 0]  # (block_kv, d)
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale

        seg_q = seg_q_ref[0]  # (block_q, LANES), lane-replicated
        seg_kv = seg_kv_ref[0]  # (SUBLANES, block_kv), sublane-replicated
        mask = seg_q[:, :1] == seg_kv[:1, :]
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            mask = mask & (cols <= rows)
        s = s + jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]  # (block_q, LANES), lane-replicated
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # (block_q, LANES)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])  # (block_q, block_kv)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe[:, :1]).astype(o_ref.dtype)
        m = m_scr[...]
        lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(l_safe))
        lse_ref[0, 0] = lse


def _fwd_call(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    seg_q: jax.Array,  # (B, Sq) int32
    seg_kv: jax.Array,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nq, nkv = sq // block_q, skv // block_kv
    grid = (b, h, nq, nkv)
    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=nkv,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec(
                (1, SUBLANES, block_kv), lambda b, h, qi, ki: (b, 0, ki)
            ),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, qi, ki: (b, h, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seg_q, seg_kv, q, k, v)
    return o, lse


# ───────────────────────────── backward ─────────────────────────────


def _bwd_dkv_kernel(
    seg_q_ref,
    seg_kv_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    dk_ref,
    dv_ref,
    dk_scr,
    dv_scr,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
    num_q_blocks: int,
):
    ki, qi = pl.program_id(2), pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_kv

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]  # (block_q, 1)
        di = di_ref[0, 0][:, :1]

        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        mask = seg_q_ref[0][:, :1] == seg_kv_ref[0][:1, :]
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            mask = mask & (cols <= rows)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # (block_q, block_kv)

        # dv += p^T @ do
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dp = do @ v^T
        dp = jax.lax.dot_general(
            do,
            v.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di) * scale
        # dk += ds^T @ q
        dk_scr[...] += jax.lax.dot_general(
            ds,
            q.astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    seg_q_ref,
    seg_kv_ref,
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    di_ref,
    dq_ref,
    dq_scr,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    qi, ki = pl.program_id(2), pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = True
    if causal:
        should_run = (qi + 1) * block_q - 1 >= ki * block_kv

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]

        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        mask = seg_q_ref[0][:, :1] == seg_kv_ref[0][:1, :]
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            cols = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            mask = mask & (cols <= rows)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do,
            v.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di) * scale
        dq_scr[...] += jax.lax.dot_general(
            ds,
            k.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_call(
    q,
    k,
    v,
    seg_q,
    seg_kv,
    o,
    lse,
    do,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    nq, nkv = sq // block_q, skv // block_kv

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (b, h, sq, LANES))

    common_in_specs = [
        pl.BlockSpec((1, block_q), lambda b, h, x, y, qsel: (b, qsel)),
    ]
    del common_in_specs  # built per-kernel below for clarity

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        num_q_blocks=nq,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b, h, ki, qi: (b, qi, 0)),
            pl.BlockSpec(
                (1, SUBLANES, block_kv), lambda b, h, ki, qi: (b, 0, ki)
            ),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, ki, qi: (b, h, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, ki, qi: (b, h, qi, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, ki, qi: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seg_q, seg_kv, q, k, v, do, lse, di)

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=nkv,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec(
                (1, SUBLANES, block_kv), lambda b, h, qi, ki: (b, 0, ki)
            ),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(seg_q, seg_kv, q, k, v, do, lse, di)
    return dq, dk, dv


# ─────────────────────── custom_vjp wiring ───────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, seg_q, seg_kv, causal, scale, block_q, block_kv):
    o, _ = _fwd_call(q, k, v, seg_q, seg_kv, causal, scale, block_q, block_kv)
    return o


def _flash_fwd(q, k, v, seg_q, seg_kv, causal, scale, block_q, block_kv):
    o, lse = _fwd_call(q, k, v, seg_q, seg_kv, causal, scale, block_q, block_kv)
    return o, (q, k, v, seg_q, seg_kv, o, lse)


def _flash_bwd(causal, scale, block_q, block_kv, res, do):
    q, k, v, seg_q, seg_kv, o, lse = res
    dq, dk, dv = _bwd_call(
        q, k, v, seg_q, seg_kv, o, lse, do, causal, scale, block_q, block_kv
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ─────────────────────────── public API ───────────────────────────


def flash_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Skv, Hkv, D)
    v: jax.Array,
    *,
    causal: bool = True,
    pad_mask_q: Optional[jax.Array] = None,  # (B, Sq) bool/int
    pad_mask_kv: Optional[jax.Array] = None,
    segment_ids_q: Optional[jax.Array] = None,  # (B, Sq) int
    segment_ids_kv: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> jax.Array:
    """Flash attention over (B, S, H, D) inputs; returns (B, Sq, H, D).

    GQA is handled by repeating KV heads (the repeat is free under XLA as it
    lowers to a broadcast feeding the kernel's per-head slices).

    Default blocks are 1024x1024 (measured on v5e: +16% fwd+bwd over 512x512
    at S=1024/2048, tools/flash_bench.py; VMEM fwd ~6.3MB of the 16MB scoped
    budget). Ablations show the kernel sits at the matmul-structure floor --
    an mm-only kernel (no softmax/mask) runs in the same time, and raw XLA
    takes longer for the QK^T matmul alone than this kernel takes end-to-end,
    so the remaining gap to the MXU roofline is the D=128-contraction matmul
    shape itself, not the VPU softmax.
    """
    b, sq, h, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    if h != hkv:
        n_rep = h // hkv
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scale = d**-0.5 if scale is None else scale

    # Combined segment ids: padding becomes sentinel segments that never match.
    seg_q = (
        segment_ids_q.astype(jnp.int32)
        if segment_ids_q is not None
        else jnp.zeros((b, sq), jnp.int32)
    )
    seg_kv = (
        segment_ids_kv.astype(jnp.int32)
        if segment_ids_kv is not None
        else jnp.zeros((b, skv), jnp.int32)
    )
    if pad_mask_q is not None:
        seg_q = jnp.where(pad_mask_q.astype(bool), seg_q, _Q_PAD_SEG)
    if pad_mask_kv is not None:
        seg_kv = jnp.where(pad_mask_kv.astype(bool), seg_kv, _KV_PAD_SEG)

    block_q = min(block_q, _ceil_to(sq, LANES))
    block_kv = min(block_kv, _ceil_to(skv, LANES))
    sq_p, skv_p = _ceil_to(sq, block_q), _ceil_to(skv, block_kv)

    def pad_to(x, target, axis, value=0):
        if x.shape[axis] == target:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, widths, constant_values=value)

    qt = pad_to(jnp.swapaxes(q, 1, 2), sq_p, 2)  # (B, H, Sq_p, D)
    kt = pad_to(jnp.swapaxes(k, 1, 2), skv_p, 2)
    vt = pad_to(jnp.swapaxes(v, 1, 2), skv_p, 2)
    seg_q = pad_to(seg_q, sq_p, 1, _Q_PAD_SEG)
    seg_kv = pad_to(seg_kv, skv_p, 1, _KV_PAD_SEG)
    # Lane-/sublane-replicated layouts keep every kernel operand 2D-tiled.
    seg_q = jax.lax.broadcast_in_dim(seg_q, (b, sq_p, LANES), (0, 1))
    seg_kv = jax.lax.broadcast_in_dim(seg_kv, (b, SUBLANES, skv_p), (0, 2))

    o = _flash(qt, kt, vt, seg_q, seg_kv, causal, scale, block_q, block_kv)
    return jnp.swapaxes(o[:, :, :sq, :], 1, 2)
