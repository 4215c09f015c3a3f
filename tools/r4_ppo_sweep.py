"""Round-4 on-chip PPO remat/rollout sweep (VERDICT r3 next-item 2: PPO
never got the DPO-style remat sweep; target e2e MFU >= 0.40).

Runs `bench.py --seg ppo` subprocess-isolated per config with PPO_REMAT /
PPO_ROLLOUT env knobs. Appends to tools/r4_sweep_results.log.

Run: python tools/r4_ppo_sweep.py
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(HERE, "r4_sweep_results.log")

# (remat, rollout, batch, minibatch, update_remat). Pass 1 (remat=update
# remat, full batch) showed every policy but 'attn' OOMs the b=8 update —
# pass 2 shrinks the UPDATE minibatch to refit the fast policies ('acts'
# beat 'attn' 1.35x/token in the DPO sweeps) and scales the ROLLOUT batch
# to amortize its weight-bound decode. TRL-faithful: mini_batch_size.
CONFIGS = [
    ("attn", "static", 8, 4, "acts"),    # refit acts via mb=4
    ("attn", "static", 8, 4, "mlp1"),
    ("attn", "static", 8, 2, "acts"),    # even smaller update slice
    ("attn", "static", 16, 4, "acts"),   # 2x rollout batch, amortize decode
    ("attn", "static", 16, 8, "attn"),   # 2x batch at the known-safe policy
    ("attn", "cb", 16, 4, "acts"),       # + slot-refill rollouts
]


def main():
    for remat, rollout, batch, mb, uremat in CONFIGS:
        env = dict(os.environ, PPO_REMAT=remat, PPO_ROLLOUT=rollout,
                   PPO_BATCH=str(batch), PPO_MINIBATCH=str(mb),
                   PPO_UPDATE_REMAT=uremat)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--seg", "ppo"],
            capture_output=True, text=True, timeout=2400, cwd=REPO, env=env,
        )
        out = None
        for line in reversed((p.stdout or "").strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        rec = {"config": {"remat": remat, "rollout": rollout,
                          "batch": batch, "mb": mb, "update_remat": uremat},
               "wall_s": round(time.time() - t0, 1)}
        if out is None:
            rec["error"] = (p.stderr or "")[-400:].replace("\n", " | ")
        else:
            rec.update(out)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(f"[r4 ppo_sweep] {line}\n")


if __name__ == "__main__":
    main()
