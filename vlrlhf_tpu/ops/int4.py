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

Representation (per linear):
  kernel_q4:    (in/2, out) int8 — two 4-bit codes per byte, SPLIT-HALF
                packed: byte row i holds unpacked row i in its LOW nibble
                and unpacked row i + in/2 in its HIGH nibble. Unpacking is
                two sign-extending shifts yielding two CONTIGUOUS row
                blocks — no sublane interleave (expensive on TPU).
  kernel_scale: (in/GROUP, out) bf16 — symmetric per-(group, out-channel)
                scales, GROUP=64 rows along `in` (finer than GPTQ's usual
                128: the kernel iterates 64-row packed blocks, so group
                boundaries align with iteration for free).
Codes are [-8, 7]; y[t,o] = sum_g scale[g,o] * (x[t, g*64:(g+1)*64] @
q[g*64:(g+1)*64, o]).

`linear()` (models/common.py) dispatches on the "kernel_q4" key, so int4
params flow through decode, chunk prefill, full prefill, LoRA deltas, and
the fused-wqkv layout (models/lm/fuse.py concatenates packed kernels along
`out` — packing is along `in`, so fusion stays exact) unchanged.

Kernel grid: (T blocks, out blocks). Each program DMAs its (in/2, O_blk)
packed column panel + (in/64, O_blk) scales, loops 64-row packed blocks:
two shifts (VPU), two (T_blk, 64) @ (64, O_blk) MXU dots, scale-weighted
f32 accumulate. Runs in interpret mode off-TPU; `force_xla=True` is the
dense dequant oracle for parity tests.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PyTree = Any

GROUP = 64  # quantization group rows along `in` (== packed-block rows * 1)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Quantize / pack / dequantize


def quantize_kernel_int4(k2d: jax.Array):
    """(in, out) float kernel -> ((in/2, out) int8 packed, (in/64, out) bf16
    scales). Requires in % (2 * GROUP) == 0 (halves split on group bounds)."""
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
    return packed, scale[:, 0, :].astype(jnp.bfloat16)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed int8 -> (in, out) int8 codes in [-8, 7]."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend low
    hi = jnp.right_shift(packed, 4)  # arithmetic shift sign-extends high
    return jnp.concatenate([lo, hi], axis=0)


def dequantize_kernel_int4(
    packed: jax.Array, scale: jax.Array, dtype=jnp.bfloat16
) -> jax.Array:
    """Dense (in, out) kernel — export / oracle / XLA-fallback path."""
    q = unpack_int4(packed).astype(jnp.float32)
    s = jnp.repeat(scale.astype(jnp.float32), GROUP, axis=0)  # (in, out)
    return (q * s).astype(dtype)


def quantize_kernel_int4_np(k):
    """Host (numpy) twin of quantize_kernel_int4 — used by the streaming
    porter's quantize-during-port mode (utils/hf_port.port_quantize bits=4):
    per-layer kernels pack ON HOST so a 7B int4 load's device transient is
    the ~3.3 GiB packed stack, never the bf16 model. Same math (f32 group
    amax, symmetric /7, round-half-even, split-half nibble packing).
    k: (in, out) -> ((in/2, out) int8, (in/64, out) bf16)."""
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
    return packed, scale[:, 0, :].astype(ml_dtypes.bfloat16)


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
# Pallas dequant-matmul


def _int4_matmul_kernel(
    x_ref,  # (T_blk, in) bf16
    p_ref,  # (in/2, O_blk) int8 packed
    s_ref,  # (in/64, O_blk) bf16 group scales
    o_ref,  # (T_blk, O_blk) bf16
    *,
    d_in: int,
):
    half = d_in // 2
    n_blocks = half // GROUP  # 64-row packed blocks == low-half groups
    t_blk = x_ref.shape[0]
    o_blk = o_ref.shape[1]

    def body(j, acc):
        pb = p_ref[pl.ds(j * GROUP, GROUP), :]  # (64, O_blk) int8
        # unpack via int32 shifts (int8 vector shifts are not a proven
        # Mosaic op; int8->int32 extension and int32 shifts are): low
        # nibble sign-extends by <<28 >>28, high by <<24 >>28
        p32 = pb.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(
            jnp.bfloat16
        )
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(
            jnp.bfloat16
        )
        xlo = x_ref[:, pl.ds(j * GROUP, GROUP)]  # (T_blk, 64)
        xhi = x_ref[:, pl.ds(half + j * GROUP, GROUP)]
        plo = jax.lax.dot(xlo, lo, preferred_element_type=jnp.float32)
        phi = jax.lax.dot(xhi, hi, preferred_element_type=jnp.float32)
        slo = s_ref[pl.ds(j, 1), :].astype(jnp.float32)  # (1, O_blk)
        shi = s_ref[pl.ds(n_blocks + j, 1), :].astype(jnp.float32)
        return acc + plo * slo + phi * shi

    acc = jax.lax.fori_loop(
        0, n_blocks, body, jnp.zeros((t_blk, o_blk), jnp.float32)
    )
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("force_xla",))
def int4_matmul(
    x2d: jax.Array,  # (T, in)
    packed: jax.Array,  # (in/2, out) int8
    scale: jax.Array,  # (in/64, out) bf16
    force_xla: bool = False,
) -> jax.Array:
    """y = x @ dequant(packed, scale) without materializing the kernel."""
    t, d_in = x2d.shape
    d_out = packed.shape[1]
    if force_xla:
        w = dequantize_kernel_int4(packed, scale, x2d.dtype)
        return x2d @ w

    o_blk = 256 if d_out % 256 == 0 else 128
    pad_o = (-d_out) % o_blk
    if pad_o:
        packed = jnp.pad(packed, ((0, 0), (0, pad_o)))
        scale = jnp.pad(scale, ((0, 0), (0, pad_o)))
    t_blk = min(256, max(8, -(-t // 8) * 8))
    pad_t = (-t) % t_blk
    xp = jnp.pad(x2d, ((0, pad_t), (0, 0))) if pad_t else x2d

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, d_in=d_in),
        grid=((t + pad_t) // t_blk, (d_out + pad_o) // o_blk),
        in_specs=[
            pl.BlockSpec((t_blk, d_in), lambda ti, oi: (ti, 0)),
            pl.BlockSpec((d_in // 2, o_blk), lambda ti, oi: (0, oi)),
            pl.BlockSpec((d_in // GROUP, o_blk), lambda ti, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec((t_blk, o_blk), lambda ti, oi: (ti, oi)),
        out_shape=jax.ShapeDtypeStruct((t + pad_t, d_out + pad_o), x2d.dtype),
        interpret=_interpret(),
    )(xp.astype(jnp.bfloat16), packed, scale)
    return out[:t, :d_out]


# ---------------------------------------------------------------------------
# Backward kernel: dx = dy @ W^T (QLoRA training with a frozen int4 base —
# only the activation cotangent is needed; the packed kernel never gets a
# gradient). The split-half packing means one 64-row packed block unpacks to
# two NON-contiguous 64-row stripes of `in`, so the kernel writes two
# outputs (low-half dx, high-half dx) that the wrapper concatenates.


def _int4_matmul_t_kernel(
    dy_ref,  # (T_blk, out) bf16
    p_ref,  # (64, out) int8 packed rows for THIS in-block
    s_ref,  # (1, 2, out) bf16 — [low group scale; high group scale]
    lo_ref,  # (T_blk, 64) dx low-half block
    hi_ref,  # (T_blk, 64)
    *,
    o_blk: int,
):
    d_out = dy_ref.shape[1]
    t_blk = dy_ref.shape[0]
    dims = (((1,), (1,)), ((), ()))  # contract both operands' `out` dim

    def body(j, accs):
        alo, ahi = accs
        pb = p_ref[:, pl.ds(j * o_blk, o_blk)]  # (64, o_blk)
        dyb = dy_ref[:, pl.ds(j * o_blk, o_blk)]
        p32 = pb.astype(jnp.int32)  # int32 shifts: proven Mosaic ops
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(
            jnp.bfloat16
        )
        hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(
            jnp.bfloat16
        )
        slo = s_ref[0, pl.ds(0, 1), pl.ds(j * o_blk, o_blk)]  # (1, o_blk)
        shi = s_ref[0, pl.ds(1, 1), pl.ds(j * o_blk, o_blk)]
        wlo = lo * slo  # dequantized (64, o_blk) stripes
        whi = hi * shi
        alo = alo + jax.lax.dot_general(
            dyb, wlo, dims, preferred_element_type=jnp.float32
        )
        ahi = ahi + jax.lax.dot_general(
            dyb, whi, dims, preferred_element_type=jnp.float32
        )
        return alo, ahi

    z = jnp.zeros((t_blk, GROUP), jnp.float32)
    alo, ahi = jax.lax.fori_loop(0, d_out // o_blk, body, (z, z))
    lo_ref[...] = alo.astype(lo_ref.dtype)
    hi_ref[...] = ahi.astype(hi_ref.dtype)


@functools.partial(jax.jit, static_argnames=("force_xla",))
def int4_matmul_t(
    dy2d: jax.Array,  # (T, out)
    packed: jax.Array,  # (in/2, out)
    scale: jax.Array,  # (in/64, out)
    force_xla: bool = False,
) -> jax.Array:
    """dx = dy @ dequant(packed, scale)^T without materializing the kernel."""
    t, d_out = dy2d.shape
    half = packed.shape[0]
    d_in = 2 * half
    if force_xla:
        w = dequantize_kernel_int4(packed, scale, dy2d.dtype)
        return dy2d @ w.T

    o_blk = 256 if d_out % 256 == 0 else 128
    pad_o = (-d_out) % o_blk
    dyp = dy2d
    if pad_o:
        packed = jnp.pad(packed, ((0, 0), (0, pad_o)))
        scale = jnp.pad(scale, ((0, 0), (0, pad_o)))
        dyp = jnp.pad(dyp, ((0, 0), (0, pad_o)))
    # keep the (t_blk, out) dy block under ~6 MB of VMEM (wide-vocab heads)
    fit = max(8, (6 * 2**20) // (2 * (d_out + pad_o)) // 8 * 8)
    t_blk = min(256, max(8, -(-t // 8) * 8), fit)
    pad_t = (-t) % t_blk
    if pad_t:
        dyp = jnp.pad(dyp, ((0, pad_t), (0, 0)))
    n_half_groups = half // GROUP
    # scales rows regrouped per packed block: [low_j, high_j] pairs
    s2 = jnp.stack(
        [scale[:n_half_groups], scale[n_half_groups:]], axis=1
    )  # (half/64, 2, out)

    lo, hi = pl.pallas_call(
        functools.partial(_int4_matmul_t_kernel, o_blk=o_blk),
        grid=((t + pad_t) // t_blk, half // GROUP),
        in_specs=[
            pl.BlockSpec((t_blk, d_out + pad_o), lambda ti, ji: (ti, 0)),
            pl.BlockSpec((GROUP, d_out + pad_o), lambda ti, ji: (ji, 0)),
            pl.BlockSpec(
                (1, 2, d_out + pad_o), lambda ti, ji: (ji, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((t_blk, GROUP), lambda ti, ji: (ti, ji)),
            pl.BlockSpec((t_blk, GROUP), lambda ti, ji: (ti, ji)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t + pad_t, half), dy2d.dtype),
            jax.ShapeDtypeStruct((t + pad_t, half), dy2d.dtype),
        ],
        interpret=_interpret(),
    )(dyp.astype(jnp.bfloat16), packed, s2)
    return jnp.concatenate([lo[:t], hi[:t]], axis=1)


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
    return y2d.reshape(*lead, y2d.shape[-1]).astype(x.dtype)
