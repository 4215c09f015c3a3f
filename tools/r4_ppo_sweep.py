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

CONFIGS = [
    ("attn", "static"),  # r3 shipping config — the reference point
    ("acts", "static"),  # chunked logps changed the fitting math vs r3
    ("mlp", "static"),
    ("mlp1", "static"),
    ("acts", "cb"),      # best remat + slot-refill eos-stopping rollouts
]


def main():
    for remat, rollout in CONFIGS:
        env = dict(os.environ, PPO_REMAT=remat, PPO_ROLLOUT=rollout)
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
        rec = {"config": {"remat": remat, "rollout": rollout},
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
