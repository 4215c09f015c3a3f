"""Ingest pre-quantized GPTQ checkpoints into the native int4 layout.

The reference loads already-GPTQ-quantized bases with AutoGPTQ
(`/root/reference/src/vlrlhf/utils/auto_load.py:527-531`, `q_lora` +
`bits=4`); round 3 could only re-quantize bf16 checkpoints with our own
RTN. This module converts the AutoGPTQ/HF-GPTQ tensor quadruple
(qweight, qzeros, scales, g_idx) for one linear into ops/int4.py's
representation WITHOUT a float detour, so the checkpoint's calibrated
codes are preserved exactly:

  - GPTQ stores W[i, o] = scales[g, o] * (q[i, o] - z[g, o]) with
    q in [0, 15] packed 8-per-int32 along `in` (qweight), and z packed
    8-per-int32 along `out` (qzeros, stored MINUS ONE — the AutoGPTQ
    convention; z = unpacked + 1).
  - Our kernel is symmetric with codes in [-8, 7]. Rewrite:
        W = s * (q - 8)  +  s * (8 - z)
    The first term is exactly our layout (codes q-8, same scales); the
    second is constant within a (group, out) cell — it becomes the
    "kernel_gbias" (n_groups64, out) leaf that int4_apply applies as a
    tiny group-summed-x matmul outside the Pallas call. Symmetric GPTQ
    checkpoints (z == 8 everywhere) produce no gbias leaf at all.
  - GPTQ group_size must be a multiple of ours (64): scales/zeros expand
    by repetition (exact). Activation-ordered checkpoints (desc_act=True,
    non-trivial g_idx) permute rows during calibration; converting them
    exactly would require permuting activations at runtime — refused with
    a clear error (the reference's serving stacks pay the same gather).

Everything is host-side numpy (the porter's streaming path calls this
per-tensor; nothing bf16-sized ever lands on the device).
"""

from __future__ import annotations

import numpy as np

from vlrlhf_tpu.ops.int4 import GROUP, _BLK, _half_padded


def unpack_rows_int32(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """(n/8, out) int32, 8 4-bit codes per word along DIM 0 -> (n, out)."""
    per = 32 // bits
    shifts = np.arange(per, dtype=np.uint32) * bits
    u = packed.astype(np.uint32)[:, None, :] >> shifts[None, :, None]
    u = (u & ((1 << bits) - 1)).astype(np.int32)
    return u.reshape(-1, packed.shape[1])


def unpack_cols_int32(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """(g, out/8) int32, 8 4-bit codes per word along DIM 1 -> (g, out)."""
    per = 32 // bits
    shifts = np.arange(per, dtype=np.uint32) * bits
    u = packed.astype(np.uint32)[:, :, None] >> shifts[None, None, :]
    u = (u & ((1 << bits) - 1)).astype(np.int32)
    return u.reshape(packed.shape[0], -1)


def convert_gptq_linear(
    qweight: np.ndarray,  # (in/8, out) int32
    qzeros: np.ndarray,  # (n_groups, out/8) int32 (stored as z-1)
    scales: np.ndarray,  # (n_groups, out) f16/f32
    g_idx: np.ndarray | None = None,  # (in,) group index per row
    bits: int = 4,
) -> dict:
    """One GPTQ linear -> {"kernel_q4", "kernel_scale"[, "kernel_gbias"]}.

    Raises ValueError for layouts the exact path cannot represent
    (bits != 4, activation ordering, group_size not a multiple of 64)."""
    import ml_dtypes

    if bits != 4:
        raise ValueError(f"only bits=4 GPTQ is ingestable (got {bits})")
    q = unpack_rows_int32(qweight, bits)  # (in, out) in [0, 15]
    din, dout = q.shape
    n_groups = scales.shape[0]
    if din % n_groups:
        raise ValueError(f"in={din} not divisible by n_groups={n_groups}")
    gsz = din // n_groups
    if g_idx is not None:
        expect = np.arange(din) // gsz
        if not np.array_equal(np.asarray(g_idx).ravel(), expect):
            raise ValueError(
                "activation-ordered GPTQ (desc_act=True) permutes rows "
                "during calibration; exact ingestion would need a runtime "
                "activation gather — re-quantize without act-order, or "
                "port the bf16 checkpoint through our RTN instead"
            )
    if gsz % GROUP:
        raise ValueError(
            f"GPTQ group_size={gsz} is not a multiple of our {GROUP}; "
            "exact ingestion impossible (scales would straddle blocks)"
        )
    if din % (2 * GROUP):
        raise ValueError(f"in={din} not divisible by {2 * GROUP}")

    z = unpack_cols_int32(qzeros, bits)[:, :dout] + 1  # AutoGPTQ z-1 storage
    s = np.asarray(scales, np.float32)

    rep = gsz // GROUP
    s64 = np.repeat(s, rep, axis=0)  # (din/64, out)
    z64 = np.repeat(z, rep, axis=0)

    # symmetric part: codes q-8 in [-8, 7], split-half nibble packing
    # identical to quantize_kernel_int4_np's layout
    codes = (q - 8).astype(np.int8)
    half = din // 2
    packed = ((codes[:half] & np.int8(0x0F)) | (codes[half:] << 4)).astype(
        np.int8
    )
    pad = _half_padded(half) - half
    if pad:
        packed = np.pad(packed, ((0, pad), (0, 0)))
    # our kernel consumes bf16 scales: GPTQ's f16 scales round to bf16
    # (codes stay EXACT; the scale rounding is <= 2^-8 relative — far
    # below a fresh RTN's full re-rounding of every code)
    s64b = s64.astype(ml_dtypes.bfloat16)
    scale2d = s64b
    if (din // _BLK) % 2:  # odd n_lo -> guard row (ops/int4.py layout)
        scale2d = np.pad(scale2d, ((0, 1), (0, 0)))
    out = {"kernel_q4": packed, "kernel_scale": scale2d}

    # gbias from the bf16-ROUNDED scales so the two terms reconstruct the
    # same W the kernel computes: W = s_b16*(q-8) + s_b16*(8-z). Stored
    # bf16 ((in/64, out) leaves are ~200 MB at 7B in f32 — not worth 2x
    # bytes for a <0.2%-of-W rounding on the zero-point term).
    gbias = s64b.astype(np.float32) * (8.0 - z64)  # (din/64, out)
    if np.any(gbias != 0.0):
        out["kernel_gbias"] = gbias.astype(ml_dtypes.bfloat16)
    return out


def dequantize_gptq_reference(qweight, qzeros, scales, bits=4) -> np.ndarray:
    """The textbook GPTQ dequant — the oracle the converter is tested
    against: W[i, o] = scales[g(i), o] * (q[i, o] - (qzeros[g(i), o] + 1))."""
    q = unpack_rows_int32(qweight, bits).astype(np.float32)
    din = q.shape[0]
    n_groups = scales.shape[0]
    gsz = din // n_groups
    z = (unpack_cols_int32(qzeros, bits) + 1).astype(np.float32)
    s = np.asarray(scales, np.float32)
    gi = np.arange(din) // gsz
    return s[gi] * (q - z[gi])


def pack_gptq_reference(q, z, s, gsz):
    """Build AutoGPTQ-layout tensors from plain (q, z, s) — the synthetic-
    checkpoint generator for tests (no real GPTQ checkpoints exist in this
    offline environment). q (in, out) in [0,15]; z (n_groups, out) in
    [1,16]; s (n_groups, out) float."""
    din, dout = q.shape
    per = 8
    qw = np.zeros((din // per, dout), np.uint32)
    for j in range(per):
        qw |= (q[j::per].astype(np.uint32) & 0xF) << (4 * j)
    zm1 = (z - 1).astype(np.uint32) & 0xF
    qz = np.zeros((z.shape[0], dout // per), np.uint32)
    for j in range(per):
        qz |= zm1[:, j::per] << (4 * j)
    return (
        qw.astype(np.int32),
        qz.astype(np.int32),
        np.asarray(s, np.float16),
        (np.arange(din) // gsz).astype(np.int32),
    )
