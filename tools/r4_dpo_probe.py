"""Round-4 bf16 DPO headline headroom probe (VERDICT r3 weak #5: the
headline was flat 1.577 -> 1.578 pairs/s across rounds with no headroom
analysis; QLoRA's 59% MFU says the chip has more).

The hypothesis: at 1 pair/step the update pass is weight-READ-bound
(13.2 GiB bf16 streamed per fwd+bwd); doubling tokens per step (2 pairs,
or 1 pair at seq 2048) amortizes the weight stream and lifts MFU — IF the
activations fit. r3 hit a compile-helper 500 (compile-time OOM) at
2 pairs with the then-default policy; chunked logps + heavier remat
change that fitting math. Each config runs subprocess-isolated.

Run: python tools/r4_dpo_probe.py   (appends to tools/r4_sweep_results.log)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(HERE, "r4_sweep_results.log")

# (n_pairs, seq, remat, logits_chunk)
CONFIGS = [
    (1, 1024, "attn", 256),  # shipping headline — the reference point
    (2, 1024, "full", 128),  # 2x tokens, max remat, small chunks
    (2, 1024, "attn", 128),  # 2x tokens at the shipping policy
    (1, 2048, "attn", 256),  # 2x tokens via seq (flash scales, no refit)
    (1, 2048, "acts", 256),
]

SNIPPET = r"""
import dataclasses, json, sys
sys.path.insert(0, ".")
import bench
from vlrlhf_tpu.models.registry import FAMILIES

n_pairs, seq, remat, chunk = {n_pairs}, {seq}, "{remat}", {chunk}
cfg = FAMILIES["llava"].make_config()
cfg = dataclasses.replace(
    cfg, lm=dataclasses.replace(cfg.lm, remat_policy=remat))
pps, ms, mfu, _ = bench._measure_dpo(
    cfg, n_pairs=n_pairs, seq=seq, n_steps=10, n_warmup=3,
    precompute_ref=True, dpo_kwargs={{"logits_chunk": chunk}},
)
print(json.dumps({{
    "pairs_per_sec": round(pps, 3), "step_ms": round(ms, 1),
    "mfu": round(mfu, 4),
    "tok_per_sec": round(2 * n_pairs * seq * 1000 / ms, 1),
}}))
"""


def main():
    for n_pairs, seq, remat, chunk in CONFIGS:
        code = SNIPPET.format(n_pairs=n_pairs, seq=seq, remat=remat,
                              chunk=chunk)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=2400, cwd=REPO,
        )
        out = None
        for line in reversed((p.stdout or "").strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        rec = {"config": {"pairs": n_pairs, "seq": seq, "remat": remat,
                          "chunk": chunk},
               "wall_s": round(time.time() - t0, 1)}
        if out is None:
            rec["error"] = (p.stderr or "")[-400:].replace("\n", " | ")
        else:
            rec.update(out)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(f"[r4 dpo_probe] {line}\n")


if __name__ == "__main__":
    main()
