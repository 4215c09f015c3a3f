"""Weights-only int4 serving: group-wise RTN quantization + Pallas
dequant-matmul.

The TPU counterpart of the reference's 4-bit surface (GPTQ-quantized bases
under `lora_args.q_lora` + `bits`, /root/reference/src/vlrlhf/utils/
auto_load.py:509-578) and the W4A16 mode of CUDA serving stacks. Decode is
HBM-weight-bandwidth-bound; int4 halves weight bytes/token again over int8.

int8 gets away with plain XLA (`x @ w.astype(bf16) * scale` streams the int8
kernel directly). int4 CANNOT: XLA has no packed-nibble operand, so an XLA
path must materialize the unpacked kernel in HBM first — reading int4 +
writing bf16 + reading bf16 is MORE bytes than int8. The win requires
unpacking in VMEM between the DMA and the MXU, i.e. a Pallas kernel.

Representation (per linear; `in` is the linear's true input width):
  kernel_q4:    (half_p, out) int8, half_p = ceil(in/2 / 128) * 128 — two
                4-bit codes per byte, SPLIT-HALF packed: byte row i < in/2
                holds unpacked row i in its LOW nibble and row i + in/2 in
                its HIGH nibble; rows >= in/2 are zero padding. Unpacking
                is two sign-extending shifts yielding two CONTIGUOUS row
                blocks — no sublane interleave (expensive on TPU). The
                128-row padding exists because Mosaic requires lane-dim
                (dim 1) vector accesses at offsets provably divisible by
                128: the kernel walks x in 128-column steps, so the packed
                panel must cover a whole number of 128-row blocks.
  kernel_scale: (S, out) bf16 — symmetric per-(group, out-channel) scales,
                GROUP=64 rows along `in`. Low-half groups occupy rows
                [0, n_lo), high-half groups rows [n_lo, 2*n_lo) with
                n_lo = in/128, plus ONE trailing zero row iff n_lo is odd
                (keeps the kernel's paired-group scale reads in bounds).
                The true input width is recoverable from the scale alone:
                in = 64 * (S - S % 2).
Codes are [-8, 7]; y[t,o] = sum_g scale[g,o] * (x[t, g*64:(g+1)*64] @
q[g*64:(g+1)*64, o]).

`linear()` (models/common.py) dispatches on the "kernel_q4" key, so int4
params flow through decode, chunk prefill, full prefill, LoRA deltas, and
the fused-wqkv layout (models/lm/fuse.py concatenates packed kernels along
`out` — packing is along `in`, so fusion stays exact) unchanged.

Forward kernel grid: (T blocks, out blocks). Each program holds its
(half_p, O_blk) packed column panel + (S, O_blk) scales + the (T_blk,
half_p) low/high activation panels (the wrapper splits x at in/2 and
zero-pads both halves to half_p — x columns are the only per-call copies;
the weight is never copied). The loop walks 128-row packed blocks: two
shifts (VPU) unpack 128-row low/high code blocks, per-64-row group scales
are expanded by a broadcast + leading-dim-merge reshape (no sub-128
slicing anywhere), and two (T_blk, 128) @ (128, O_blk) MXU dots
accumulate in f32. Scaling the
WEIGHT pre-dot (rather than the partial products post-dot) is what allows
128-deep dots spanning two 64-row scale groups. Runs in interpret mode
off-TPU; `force_xla=True` is the dense dequant oracle for parity tests.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PyTree = Any

GROUP = 64  # quantization group rows along `in`
_BLK = 128  # packed rows (and x columns) per kernel loop step — the Mosaic
# lane-alignment unit: every dim-1 dynamic access uses offsets j * _BLK


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _half_padded(half: int) -> int:
    return -(-half // _BLK) * _BLK


def _din_from_scale_rows(s_rows: int) -> int:
    """Recover the linear's true input width from the scale row count."""
    return GROUP * (s_rows - s_rows % 2)


# ---------------------------------------------------------------------------
# Quantize / pack / dequantize


def quantize_kernel_int4(k2d: jax.Array):
    """(in, out) float kernel -> ((half_p, out) int8 packed, (S, out) bf16
    scales) per the module docstring. Requires in % (2 * GROUP) == 0."""
    din, dout = k2d.shape
    assert din % (2 * GROUP) == 0, f"in={din} not divisible by {2 * GROUP}"
    kf = k2d.astype(jnp.float32).reshape(din // GROUP, GROUP, dout)
    amax = jnp.max(jnp.abs(kf), axis=1, keepdims=True)  # (G#, 1, out)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(kf / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(din, dout)
    half = din // 2
    lo, hi = q[:half], q[half:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)), jnp.left_shift(hi, 4)
    )
    pad = _half_padded(half) - half
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    scale2d = scale[:, 0, :].astype(jnp.bfloat16)
    if (din // _BLK) % 2:  # n_lo odd -> one zero guard row (see docstring)
        scale2d = jnp.pad(scale2d, ((0, 1), (0, 0)))
    return packed, scale2d


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(half_p, out) packed int8 -> (2 * half_p, out) int8 codes in [-8, 7]
    (low-nibble rows then high-nibble rows; padded rows decode to 0)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend low
    hi = jnp.right_shift(packed, 4)  # arithmetic shift sign-extends high
    return jnp.concatenate([lo, hi], axis=0)


def dequantize_kernel_int4(
    packed: jax.Array, scale: jax.Array, dtype=jnp.bfloat16
) -> jax.Array:
    """Dense (in, out) kernel — export / oracle / XLA-fallback path. The
    true `in` comes from the scale row count (padding rows are dropped)."""
    din = _din_from_scale_rows(scale.shape[0])
    half, half_p = din // 2, packed.shape[0]
    codes = unpack_int4(packed)
    q = jnp.concatenate(
        [codes[:half], codes[half_p:half_p + half]], axis=0
    ).astype(jnp.float32)
    s = jnp.repeat(scale.astype(jnp.float32), GROUP, axis=0)[:din]
    return (q * s).astype(dtype)


def quantize_kernel_int4_np(k):
    """Host (numpy) twin of quantize_kernel_int4 — used by the streaming
    porter's quantize-during-port mode (utils/hf_port.port_quantize bits=4):
    per-layer kernels pack ON HOST so a 7B int4 load's device transient is
    the packed stack, never the bf16 model. Same math (f32 group amax,
    symmetric /7, round-half-even, split-half nibble packing) and the SAME
    padded layout as the jax path (bit-compared in tests).
    k: (in, out) -> ((half_p, out) int8, (S, out) bf16)."""
    import ml_dtypes
    import numpy as np

    din, dout = k.shape
    assert din % (2 * GROUP) == 0, f"in={din} not divisible by {2 * GROUP}"
    kf = np.asarray(k, np.float32).reshape(din // GROUP, GROUP, dout)
    amax = np.max(np.abs(kf), axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 7.0, 1.0)
    q = np.clip(np.round(kf / scale), -8, 7).astype(np.int8).reshape(din, dout)
    half = din // 2
    packed = ((q[:half] & np.int8(0x0F)) | (q[half:] << 4)).astype(np.int8)
    pad = _half_padded(half) - half
    if pad:
        packed = np.pad(packed, ((0, pad), (0, 0)))
    scale2d = scale[:, 0, :].astype(ml_dtypes.bfloat16)
    if (din // _BLK) % 2:
        scale2d = np.pad(scale2d, ((0, 1), (0, 0)))
    return packed, scale2d


def quantize_linear_int4(p: dict) -> dict:
    """Quantize one linear param dict; stacked (L, in, out) kernels map
    layer-by-layer (bounded f32 working set, same as ops/quant.py int8)."""
    k = p["kernel"]
    if k.ndim == 3:
        packed, scale = jax.lax.map(quantize_kernel_int4, k)
    else:
        packed, scale = quantize_kernel_int4(k)
    out = {"kernel_q4": packed, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


# ---------------------------------------------------------------------------
# Pallas dequant-matmul (forward)


def _expand_pair(s2, o_blk):
    """(2, O) adjacent group scales -> (128, O): rows 0-63 get scale row 0,
    rows 64-127 row 1. broadcast + leading-dim-merge reshape — the one
    scale-expansion construct verified to compile CORRECTLY under Mosaic
    (an iota/where select silently miscompiles on real TPU as of this
    toolchain, and sub-128 slicing is not Mosaic-provable)."""
    return jnp.broadcast_to(s2[:, None, :], (2, GROUP, o_blk)).reshape(
        _BLK, o_blk
    )


def _scale_blocks(scale: jax.Array, n_lo: int, n_blocks: int):
    """(S, out) canonical scales -> two (n_blocks, 2, out) arrays: block j
    holds the two adjacent group scales the kernel's j-th 128-row step
    needs (lo half / hi half). 3D with the block index LEADING because
    Mosaic only proves alignment for dynamic offsets on the untiled leading
    dim of a >=3D ref — a dynamic `pl.ds(2*j, 2)` row load from the 2D
    layout is rejected ("index in dimension 0 is a multiple of 8").
    Padded trailing rows (odd n_lo) are zero: zero scale x anything = 0."""
    pad = 2 * n_blocks - n_lo
    s_lo, s_hi = scale[:n_lo], scale[n_lo:2 * n_lo]
    if pad:
        s_lo = jnp.pad(s_lo, ((0, pad), (0, 0)))
        s_hi = jnp.pad(s_hi, ((0, pad), (0, 0)))
    dout = scale.shape[1]
    return (s_lo.reshape(n_blocks, 2, dout), s_hi.reshape(n_blocks, 2, dout))


def _unpack_block(pb):
    """(128, O) packed int8 -> bf16 (low codes, high codes). int8 vector
    shifts are not a proven Mosaic op; int8->int32 extension and int32
    shifts are: low nibble sign-extends by <<28 >>28, high by <<24 >>28."""
    p32 = pb.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.bfloat16)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(jnp.bfloat16)
    return lo, hi


def _int4_matmul_kernel(
    xlo_ref,  # (T_blk, half_p) bf16 — x[:, :in/2] zero-padded to half_p
    xhi_ref,  # (T_blk, half_p) bf16 — x[:, in/2:] zero-padded to half_p
    p_ref,  # (half_p, O_blk) int8 packed
    slo_ref,  # (n_blocks, 2, O_blk) bf16 lo-half group-scale pairs
    shi_ref,  # (n_blocks, 2, O_blk) bf16 hi-half group-scale pairs
    o_ref,  # (T_blk, O_blk)
):
    half_p = p_ref.shape[0]
    t_blk = xlo_ref.shape[0]
    o_blk = o_ref.shape[1]

    def body(j, acc):
        pb = p_ref[pl.ds(j * _BLK, _BLK), :]  # (128, O_blk) int8
        lo, hi = _unpack_block(pb)
        # dynamic index on the LEADING dim of the 3D scale refs — the only
        # dynamic-offset pattern Mosaic accepts here (see _scale_blocks).
        # For the final padded block the pair's second row is zero: zero
        # scale times all-zero padded weight/x columns contributes 0.
        slo = _expand_pair(slo_ref[j], o_blk)
        shi = _expand_pair(shi_ref[j], o_blk)
        # scale the WEIGHT pre-dot: q * s in bf16 is bit-identical to the
        # dense oracle's dequantized weight (codes and scales are exact
        # bf16), and lets one 128-deep dot span two 64-row scale groups
        wlo = lo * slo.astype(jnp.bfloat16)
        whi = hi * shi.astype(jnp.bfloat16)
        xlo_b = xlo_ref[:, pl.ds(j * _BLK, _BLK)]  # lane offsets: 128-mult
        xhi_b = xhi_ref[:, pl.ds(j * _BLK, _BLK)]
        acc = acc + jax.lax.dot(
            xlo_b, wlo, preferred_element_type=jnp.float32
        )
        return acc + jax.lax.dot(
            xhi_b, whi, preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(
        0, half_p // _BLK, body, jnp.zeros((t_blk, o_blk), jnp.float32)
    )
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("force_xla",))
def int4_matmul(
    x2d: jax.Array,  # (T, in)
    packed: jax.Array,  # (half_p, out) int8
    scale: jax.Array,  # (S, out) bf16
    force_xla: bool = False,
) -> jax.Array:
    """y = x @ dequant(packed, scale) without materializing the kernel."""
    t, d_in = x2d.shape
    d_out = packed.shape[1]
    if force_xla:
        w = dequantize_kernel_int4(packed, scale, x2d.dtype)
        return x2d @ w

    assert _din_from_scale_rows(scale.shape[0]) == d_in, (
        f"x in-dim {d_in} vs scale rows {scale.shape[0]}"
    )
    half = d_in // 2
    half_p = packed.shape[0]
    n_lo = d_in // _BLK

    o_blk = 256 if d_out % 256 == 0 else 128
    pad_o = (-d_out) % o_blk
    if pad_o:
        packed = jnp.pad(packed, ((0, 0), (0, pad_o)))
        scale = jnp.pad(scale, ((0, 0), (0, pad_o)))
    n_blocks = half_p // _BLK
    s_lo, s_hi = _scale_blocks(scale, n_lo, n_blocks)
    t_blk = min(256, max(8, -(-t // 8) * 8))
    pad_t = (-t) % t_blk
    xb = x2d.astype(jnp.bfloat16)
    # the only per-call copies are the (T, half) activation halves — the
    # packed weight is never copied on the hot path
    xlo = jnp.pad(xb[:, :half], ((0, pad_t), (0, half_p - half)))
    xhi = jnp.pad(xb[:, half:], ((0, pad_t), (0, half_p - half)))

    out = pl.pallas_call(
        _int4_matmul_kernel,
        grid=((t + pad_t) // t_blk, (d_out + pad_o) // o_blk),
        in_specs=[
            pl.BlockSpec((t_blk, half_p), lambda ti, oi: (ti, 0)),
            pl.BlockSpec((t_blk, half_p), lambda ti, oi: (ti, 0)),
            pl.BlockSpec((half_p, o_blk), lambda ti, oi: (0, oi)),
            pl.BlockSpec((n_blocks, 2, o_blk), lambda ti, oi: (0, 0, oi)),
            pl.BlockSpec((n_blocks, 2, o_blk), lambda ti, oi: (0, 0, oi)),
        ],
        out_specs=pl.BlockSpec((t_blk, o_blk), lambda ti, oi: (ti, oi)),
        out_shape=jax.ShapeDtypeStruct((t + pad_t, d_out + pad_o), x2d.dtype),
        interpret=_interpret(),
    )(xlo, xhi, packed, s_lo, s_hi)
    return out[:t, :d_out]


# ---------------------------------------------------------------------------
# Backward kernel: dx = dy @ W^T (QLoRA training with a frozen int4 base —
# only the activation cotangent is needed; the packed kernel never gets a
# gradient). Grid walks 128-row packed blocks (dim 1 of the outputs stays
# 128-wide and block-aligned); each program loops out-chunks of dy,
# dequantizes the (128, O_chunk) weight block exactly as the forward does,
# and contracts over `out`, producing the low-half and high-half dx stripes
# for its 128 columns.


def _int4_matmul_t_kernel(
    dy_ref,  # (T_blk, out_p) bf16
    p_ref,  # (128, out_p) int8 — packed rows for THIS j block
    slo_ref,  # (1, 2, out_p) bf16 — THIS block's lo-half scale pair
    shi_ref,  # (1, 2, out_p) bf16 — THIS block's hi-half scale pair
    lo_ref,  # (T_blk, 128) dx low-half columns j*128..+128
    hi_ref,  # (T_blk, 128)
    *,
    o_blk: int,
):
    d_out = dy_ref.shape[1]
    t_blk = dy_ref.shape[0]
    dims = (((1,), (1,)), ((), ()))  # contract both operands' `out` dim

    def body(jo, accs):
        alo, ahi = accs
        sl = pl.ds(jo * o_blk, o_blk)
        dyb = dy_ref[:, sl]
        lo, hi = _unpack_block(p_ref[:, sl])
        slo = _expand_pair(slo_ref[0, :, sl], o_blk)
        shi = _expand_pair(shi_ref[0, :, sl], o_blk)
        wlo = lo * slo.astype(jnp.bfloat16)
        whi = hi * shi.astype(jnp.bfloat16)
        alo = alo + jax.lax.dot_general(
            dyb, wlo, dims, preferred_element_type=jnp.float32
        )
        ahi = ahi + jax.lax.dot_general(
            dyb, whi, dims, preferred_element_type=jnp.float32
        )
        return alo, ahi

    z = jnp.zeros((t_blk, _BLK), jnp.float32)
    alo, ahi = jax.lax.fori_loop(0, d_out // o_blk, body, (z, z))
    lo_ref[...] = alo.astype(lo_ref.dtype)
    hi_ref[...] = ahi.astype(hi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("force_xla",))
def int4_matmul_t(
    dy2d: jax.Array,  # (T, out)
    packed: jax.Array,  # (half_p, out)
    scale: jax.Array,  # (S, out)
    force_xla: bool = False,
) -> jax.Array:
    """dx = dy @ dequant(packed, scale)^T without materializing the kernel."""
    t, d_out = dy2d.shape
    d_in = _din_from_scale_rows(scale.shape[0])
    half = d_in // 2
    half_p = packed.shape[0]
    n_lo = d_in // _BLK
    if force_xla:
        w = dequantize_kernel_int4(packed, scale, dy2d.dtype)
        return dy2d @ w.T

    o_blk = 256 if d_out % 256 == 0 else 128
    pad_o = (-d_out) % o_blk
    dyp = dy2d.astype(jnp.bfloat16)
    if pad_o:
        packed = jnp.pad(packed, ((0, 0), (0, pad_o)))
        scale = jnp.pad(scale, ((0, 0), (0, pad_o)))
        dyp = jnp.pad(dyp, ((0, 0), (0, pad_o)))
    n_blocks = half_p // _BLK
    s_lo, s_hi = _scale_blocks(scale, n_lo, n_blocks)
    # keep the (t_blk, out) dy block under ~6 MB of VMEM (wide-vocab heads)
    fit = max(8, (6 * 2**20) // (2 * (d_out + pad_o)) // 8 * 8)
    t_blk = min(256, max(8, -(-t // 8) * 8), fit)
    pad_t = (-t) % t_blk
    if pad_t:
        dyp = jnp.pad(dyp, ((0, pad_t), (0, 0)))

    lo, hi = pl.pallas_call(
        functools.partial(_int4_matmul_t_kernel, o_blk=o_blk),
        grid=((t + pad_t) // t_blk, half_p // _BLK),
        in_specs=[
            pl.BlockSpec((t_blk, d_out + pad_o), lambda ti, ji: (ti, 0)),
            pl.BlockSpec((_BLK, d_out + pad_o), lambda ti, ji: (ji, 0)),
            pl.BlockSpec((1, 2, d_out + pad_o), lambda ti, ji: (ji, 0, 0)),
            pl.BlockSpec((1, 2, d_out + pad_o), lambda ti, ji: (ji, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_blk, _BLK), lambda ti, ji: (ti, ji)),
            pl.BlockSpec((t_blk, _BLK), lambda ti, ji: (ti, ji)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t + pad_t, half_p), dy2d.dtype),
            jax.ShapeDtypeStruct((t + pad_t, half_p), dy2d.dtype),
        ],
        interpret=_interpret(),
    )(dyp, packed, s_lo, s_hi)
    return jnp.concatenate([lo[:t, :half], hi[:t, :half]], axis=1)


@jax.custom_vjp
def _int4_mm_diff(x2d, packed, scale):
    return int4_matmul(x2d, packed, scale)


def _int4_mm_fwd(x2d, packed, scale):
    return int4_matmul(x2d, packed, scale), (packed, scale)


def _int4_mm_bwd(res, g):
    import numpy as np

    packed, scale = res
    # the primal output has x2d's dtype, so g's dtype is x2d's dtype
    dx = int4_matmul_t(g.astype(jnp.bfloat16), packed, scale).astype(g.dtype)
    # the frozen base gets no gradient: float0 cotangents for int8 codes
    # and an explicit zero for the (tiny) scales
    return (
        dx,
        np.zeros(packed.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


_int4_mm_diff.defvjp(_int4_mm_fwd, _int4_mm_bwd)


def _multi_device_mesh() -> bool:
    from vlrlhf_tpu.core import mesh as _m

    return _m._GLOBAL_MESH is not None and _m._GLOBAL_MESH.devices.size > 1


def int4_apply(p: dict, x: jax.Array, force_xla: bool = False) -> jax.Array:
    """linear()'s int4 branch: (..., in) @ packed kernel -> (..., out).
    Differentiable w.r.t. x (custom VJP; QLoRA training over a frozen int4
    base) — the packed kernel and scales receive no gradient.

    ASYMMETRIC checkpoints (ingested GPTQ, utils/gptq.py) carry an extra
    "kernel_gbias" (n_groups, out) leaf: W = s*(q-8) + gbias[group], so
    y += group-summed-x @ gbias — an (T, in/64) @ (in/64, out) matmul in
    plain XLA OUTSIDE the Pallas call (trivially small, auto-
    differentiable, and keeps the kernel zero-point-free). Our own RTN
    quantizer is symmetric and never writes the leaf.

    Under a MULTI-DEVICE mesh the Pallas kernel would be replicated by
    GSPMD (pallas_call has no partitioning rule — every chip would gather
    every operand), so the call takes the dense dequantize-then-matmul
    path instead: fully partitionable, differentiable, and the per-layer
    bf16 dequant transient is itself sharded. int4's bandwidth win is a
    single-chip serving/QLoRA story; multi-chip keeps the 4x param-HBM
    capacity win."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    if force_xla or _multi_device_mesh():
        w = dequantize_kernel_int4(p["kernel_q4"], p["kernel_scale"],
                                   x2d.dtype)
        y2d = x2d @ w
    else:
        y2d = _int4_mm_diff(x2d, p["kernel_q4"], p["kernel_scale"])
    if "kernel_gbias" in p:
        gb = p["kernel_gbias"]
        xg = x2d.astype(jnp.float32).reshape(
            x2d.shape[0], gb.shape[0], GROUP
        ).sum(axis=-1)
        y2d = y2d + (xg @ gb.astype(jnp.float32)).astype(y2d.dtype)
    return y2d.reshape(*lead, y2d.shape[-1]).astype(x.dtype)
