"""Round-3 TPU measurement sweep — one command, incremental logging.

The axon tunnel has been flaky; this runs every pending round-3 measurement
as an isolated subprocess (each gets a fresh TPU client), appends raw output
to tools/r3_sweep_results.log as it goes, and keeps going past failures.

Segments (in cheap-first order so partial runs still yield data):
  1. sanity      — tiny matmul fetch proves the tunnel is live
  2. floor32     — tools/decode_floor.py roofline decomposition (B=32)
  3. db_int8     — decode_bench --int8 (the round-2 baseline shape)
  4. db_fuse     — decode_bench --int8 --fuse      (fusion A/B)
  5. db_int4     — decode_bench --int4             (W4A16 A/B)
  6. db_int4f    — decode_bench --int4 --fuse
  7. eval_gen    — bench.py --eval (imgs/s north star, post-fusion code)
  8. cores       — tools/judge_coresidency.py (head-major + int4-era revalidation)
  9. fam4        — family_bench --bits4 llava (int4 QLoRA training point)
 10. bench       — full python bench.py (the driver metric, longest)

Usage: python tools/r3_tpu_sweep.py [segment ...]   (default: all)
"""
import datetime
import subprocess
import sys

LOG = "tools/r3_sweep_results.log"

SEGMENTS = [
    ("sanity", [sys.executable, "-c",
                "import jax, jax.numpy as jnp; "
                "x = jnp.ones((512, 512), jnp.bfloat16); "
                "print('sanity', float((x @ x).sum()), jax.devices())"],
     180),
    ("floor32", [sys.executable, "tools/decode_floor.py", "--batch", "32"],
     900),
    ("db_int8", [sys.executable, "tools/decode_bench.py", "--int8"], 1200),
    ("db_fuse", [sys.executable, "tools/decode_bench.py", "--int8",
                 "--fuse"], 1200),
    ("db_int4", [sys.executable, "tools/decode_bench.py", "--int4"], 1200),
    ("db_int4f", [sys.executable, "tools/decode_bench.py", "--int4",
                  "--fuse"], 1200),
    ("spec", [sys.executable, "tools/spec_bench.py", "--7b", "--int8"],
     1500),
    ("srv", [sys.executable, "tools/serve_bench.py"], 1800),
    ("srv4", [sys.executable, "tools/serve_bench.py", "--adapters", "4"],
     1800),
    ("eval_gen", [sys.executable, "bench.py", "--eval"], 1800),
    ("cores", [sys.executable, "tools/judge_coresidency.py"], 1800),
    ("fam4", [sys.executable, "tools/family_bench.py", "--bits4", "llava"],
     1800),
    ("bench", [sys.executable, "bench.py"], 3600),
]


def main():
    want = set(sys.argv[1:])
    with open(LOG, "a") as log:
        log.write(f"\n===== sweep start {datetime.datetime.now()} =====\n")
    for name, cmd, tmo in SEGMENTS:
        if want and name not in want:
            continue
        print(f"--- [{name}] {' '.join(cmd)}", flush=True)
        try:
            r = subprocess.run(
                cmd, capture_output=True, text=True, timeout=tmo,
                cwd=".",
            )
            out = r.stdout + ("\n[stderr tail]\n" + r.stderr[-2000:]
                              if r.returncode else "")
            status = f"exit={r.returncode}"
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or "") + "\n[TIMEOUT]"
            status = f"timeout={tmo}s"
        with open(LOG, "a") as log:
            log.write(f"\n--- [{name}] {status} "
                      f"{datetime.datetime.now()}\n{out}\n")
        print(out[-3000:], flush=True)
        print(f"--- [{name}] {status}", flush=True)
        if name == "sanity" and status != "exit=0":
            print("tunnel still down — aborting sweep", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
