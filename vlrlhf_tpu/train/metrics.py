"""Metrics logging: wandb (optional) + JSONL, with tokens/sec and MFU.

The reference logs through wandb + TRL's built-in DPO metrics (dpo.py:102-103)
and has no throughput observability (SURVEY.md §5). Here per-step wall time,
tokens/sec and model FLOPs utilization are first-class (the BASELINE metric
is pairs/sec/chip and >=40% MFU), logged to wandb when available/configured
and always to a local JSONL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


def peak_flops_per_chip() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    table = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}
    return table.get(gen, 197e12)


class MetricsLogger:
    def __init__(
        self,
        output_dir: str,
        run_name: str = "run",
        report_to: tuple[str, ...] = ("jsonl",),
        wandb_project: Optional[str] = None,
        flops_per_step: Optional[float] = None,
        tokens_per_step: Optional[int] = None,
        flops_per_token: Optional[float] = None,
        flops_per_image: Optional[float] = None,
        n_chips: int = 1,
    ):
        from vlrlhf_tpu.core.dist import is_main_process

        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{run_name}_metrics.jsonl")
        # Only rank 0 writes sinks (the reference logs through the main
        # process's HF Trainer / wandb); other ranks still compute host
        # metrics so collective-fetching stays aligned.
        self._file = open(self.path if is_main_process() else os.devnull, "a")
        if not is_main_process():
            report_to = tuple(r for r in report_to if r != "wandb")
        self.flops_per_step = flops_per_step
        self.tokens_per_step = tokens_per_step
        # Per-token accounting (bucketed batches have varying seq): the loop
        # reports actual interval token/image counts via the reserved
        # perf/interval_tokens / perf/interval_images metrics.
        self.flops_per_token = flops_per_token
        self.flops_per_image = flops_per_image
        self.n_chips = n_chips
        self._last_t: Optional[float] = None
        self._wandb = None
        if "wandb" in report_to:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project or os.environ.get("WANDB_PROJECT", "vlrlhf-tpu"),
                    name=run_name,
                    config={},
                )
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict[str, Any]) -> dict[str, Any]:
        now = time.perf_counter()
        out = {k: float(v) for k, v in metrics.items()}
        if self._last_t is not None:
            dt = now - self._last_t
            out["perf/step_time_s"] = dt
            if self.tokens_per_step:
                out["perf/tokens_per_sec"] = self.tokens_per_step / dt
            interval_tokens = out.pop("perf/interval_tokens", None)
            interval_images = out.pop("perf/interval_images", 0.0)
            flops = None
            if self.flops_per_step:
                flops = self.flops_per_step
            elif self.flops_per_token and interval_tokens:
                flops = self.flops_per_token * interval_tokens
                if self.flops_per_image:
                    flops += self.flops_per_image * interval_images
                out["perf/tokens_per_sec"] = interval_tokens / dt
            if flops is not None:
                out["perf/mfu"] = flops / dt / (
                    peak_flops_per_chip() * self.n_chips
                )
        self._last_t = now
        record = {"step": step, **out}
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(out, step=step)
        return out

    def close(self):
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
