"""Per-compile XLA backend option overrides (VLRLHF_XLA_OPTIONS).

Why this exists: over the axon tunnel, compilation runs in a REMOTE helper
that does not inherit this process's environment — and worse, setting
TPU-backend flags in XLA_FLAGS fatals the LOCAL client at startup
("Unknown flag in XLA_FLAGS": the client's CPU XLA parses the env and does
not know xla_tpu_* flags; measured r5, tools/r5_sweep_results.log
[r5 oom_probe]). The only channel that actually reaches the TPU compiler
here is per-computation CompileOptions.env_option_overrides, i.e.
`jax.jit(f, compiler_options=...)` — those serialize with the compile
request.

Format: VLRLHF_XLA_OPTIONS="xla_tpu_foo=false,xla_tpu_bar=3". Values parse
to bool/int where possible (the DebugOptions proto rejects string "false"
for bool fields). Training-step factories (train/dpo.py, train/ppo.py,
train/sft.py, train/rm.py) merge these into their jit calls; generation
engines are intentionally NOT wired (dozens of small programs, and the
compile-OOM wall this was built to probe lives in the big training steps).

The concrete motivation (VERDICT r4 next-item 3): DPO pairs=2 / seq-2048 /
PPO batch-16 die at compile with RESOURCE_EXHAUSTED over async
copy-start/slice-start HLO temps — 8-layer slabs of the stacked LoRA
adapters, the signature of loop double-buffering / latency-hiding overlap.
This knob lets a run disable those scheduler passes without rebuilding.
"""

from __future__ import annotations

import os
from typing import Optional


def _coerce(v: str):
    low = v.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(v)
    except ValueError:
        return v.strip()


def xla_compiler_options() -> Optional[dict]:
    """Parse VLRLHF_XLA_OPTIONS into a jax.jit compiler_options dict
    (None when unset — jit treats None as 'no overrides')."""
    raw = os.environ.get("VLRLHF_XLA_OPTIONS", "").strip()
    if not raw:
        return None
    out = {}
    for item in raw.split(","):
        if not item.strip():
            continue
        k, _, v = item.partition("=")
        out[k.strip()] = _coerce(v) if v else True
    return out or None
