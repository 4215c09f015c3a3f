"""Round-4 on-chip sweep of the continuous-batching scheduler knobs at the
exact BENCH serving workload (48 reqs / 16 slots / 7B int8 W+KV, outputs
uniform(16,256)).

Each config runs `bench.py --seg serving` in its OWN subprocess (segment
isolation is load-bearing: ROADMAP benchmark-methodology-2) with knobs
passed via CB_* env vars. The static baseline is timed once by the first
config and reused (CB_SKIP_STATIC) so a full sweep fits in chip-hours.

Run: python tools/r4_cb_sweep.py [--configs "ef,grp,chunk;..."]
Appends one line per config to tools/r4_sweep_results.log.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(HERE, "r4_sweep_results.log")

DEFAULT = [
    # (exit_free, max_prefill_group, prefill_chunk)
    (2, 4, 128),   # r3 shipping config — the reference point
    (4, 4, 128),   # bigger admit groups, fewer admit dispatches
    (4, 8, 128),   # let a deep free-pool share one dispatch
    (1, 4, 128),   # refill ASAP (max occupancy, max admit count)
    (2, 4, 256),   # coarser prompt bucket: 608 -> one 640 bucket either way,
                   # but chunked-prefill inner chunks double
    (4, 8, 256),
]


def main():
    configs = DEFAULT
    if "--configs" in sys.argv:
        raw = sys.argv[sys.argv.index("--configs") + 1]
        configs = [tuple(int(x) for x in c.split(",")) for c in raw.split(";")]
    static_ips = 0.0
    for ef, grp, chunk in configs:
        env = dict(
            os.environ, CB_EXIT_FREE=str(ef), CB_GROUP=str(grp),
            CB_CHUNK=str(chunk),
        )
        if static_ips:
            env["CB_SKIP_STATIC"] = f"{static_ips:.6f}"
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--seg",
             "serving"],
            capture_output=True, text=True, timeout=2400, cwd=REPO, env=env,
        )
        out = None
        for line in reversed((p.stdout or "").strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        rec = {
            "config": {"exit_free": ef, "group": grp, "chunk": chunk},
            "wall_s": round(time.time() - t0, 1),
        }
        if out is None:
            rec["error"] = (p.stderr or "")[-400:].replace("\n", " | ")
        else:
            rec.update(out)
            if not static_ips and "static_imgs_per_sec" in out:
                static_ips = float(out["static_imgs_per_sec"])
        line = json.dumps(rec)
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(f"[r4 cb_sweep] {line}\n")


if __name__ == "__main__":
    main()
