"""Root-cause probe for the HLO-temp compile-OOM wall (VERDICT r4 missing
item 3 / next-item 3): DPO pairs=2/seq-2048, PPO batch-16 and mb=4+'acts'
all die at compile with RESOURCE_EXHAUSTED listing async `copy-start` /
`slice-start` HLO temps over 8-layer slabs of the STACKED LoRA adapter
arrays (bf16[32,4096,64], slice={[16:24],[0:4096],[0:64]} — the `a` leaves
of layers_scanned adapters).

That signature points at XLA:TPU's loop optimizations on the layer scan:
  - while-loop DOUBLE BUFFERING duplicates loop-carried/loop-read buffers
    (copy-start pairs) to overlap iteration i+1's operand fetch;
  - the LATENCY-HIDING SCHEDULER hoists/overlaps async slices of scan
    operands, extending temp live ranges across iterations.
Either can multiply the adapter stack's footprint by the overlap depth —
memory the program itself never needed (the r4 sweep showed the same shape
FITS at runtime under a smaller overlap: mb=2/'acts' runs, mb=4 dies).

Each config runs subprocess-isolated with a candidate XLA_FLAGS set; the
repro config is the fastest-failing r4 one (DPO pairs=2, seq 1024, 'attn',
chunk 128 — died in 128 s). A flag set "wins" if the config compiles AND
runs; the headline config then re-runs under the winning flags to check
for a throughput regression before shipping them as defaults.

Run: python tools/r5_oom_probe.py [--full]
(appends to tools/r5_sweep_results.log)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(HERE, "r5_sweep_results.log")

# MEASURED r5 (first probe iteration, kept in the log): putting these in
# XLA_FLAGS fatals the LOCAL axon client at startup ("Unknown flag in
# XLA_FLAGS" — the client's CPU XLA parses the env and has no xla_tpu_*
# flags), and the remote compile helper never sees this process's env
# anyway. The working channel is per-computation compiler_options
# (CompileOptions.env_option_overrides, serialized with the compile
# request) — VLRLHF_XLA_OPTIONS, parsed by core/xla_options.py and merged
# into the trainer jit sites.
FLAG_SETS = {
    "baseline": "",
    "no_double_buffer": "xla_tpu_enable_while_loop_double_buffering=false",
    "no_lhs": "xla_tpu_enable_latency_hiding_scheduler=false",
    "no_db_no_lhs": ("xla_tpu_enable_while_loop_double_buffering=false,"
                     "xla_tpu_enable_latency_hiding_scheduler=false"),
    "slop85": "xla_tpu_memory_limit_slop_factor=85",
}

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
    precompute_ref=True, quantize={quantize},
    dpo_kwargs={{"logits_chunk": chunk}},
)
print(json.dumps({{
    "pairs_per_sec": round(pps, 3), "step_ms": round(ms, 1),
    "mfu": round(mfu, 4),
    "tok_per_sec": round(2 * n_pairs * seq * 1000 / ms, 1),
}}))
"""


def run_config(tag, flags, n_pairs, seq, remat, chunk, timeout=1500,
               quantize=False):
    code = SNIPPET.format(n_pairs=n_pairs, seq=seq, remat=remat, chunk=chunk,
                          quantize=quantize)
    env = dict(os.environ)
    if flags:
        env["VLRLHF_XLA_OPTIONS"] = flags
    # flag variants must not poison (or be served stale results by) the
    # persistent compile cache keyed without the env flags
    env["JAX_COMPILATION_CACHE_DIR"] = ""
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, cwd=REPO, env=env,
        )
        out, err = p.stdout or "", p.stderr or ""
    except subprocess.TimeoutExpired:
        out, err = "", f"timeout {timeout}s"
    res = None
    for line in reversed(out.strip().splitlines()):
        try:
            res = json.loads(line)
            break
        except (json.JSONDecodeError, ValueError):
            continue
    rec = {"flags": tag,
           "config": {"pairs": n_pairs, "seq": seq, "remat": remat,
                      "chunk": chunk, "weights": "int8" if quantize
                      else "bf16"},
           "wall_s": round(time.time() - t0, 1)}
    if res is None:
        sig = "HLO temp" if "HLO temp" in err else ""
        rec["error"] = (sig + " | " if sig else "") + err[-300:].replace(
            "\n", " | ")
    else:
        rec.update(res)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(f"[r5 oom_probe] {line}\n")
    return rec


def main():
    if "--capacity" in sys.argv:
        # CAPACITY-ARITHMETIC test: the r4/r5 flag probes point at plain HBM
        # capacity, not a scheduler bug — bf16 7B weights (14.1 GB) + f32
        # adapter master+m+nu (1.4 GB) + two 1.07 GB saved per-layer stacks
        # at 4096 tokens ~= 18 GB > 17.2 GB physical. If the SAME shapes
        # compile and run with int8 base weights (frees ~7 GB), the wall is
        # capacity and the remedy is grad accumulation / QLoRA, not flags.
        run_config("capacity_int8_p2", "", 2, 1024, "attn", 128,
                   quantize=True)
        run_config("capacity_int8_p2_s2048", "", 2, 2048, "attn", 256,
                   quantize=True)
        run_config("capacity_int8_p4", "", 4, 1024, "attn", 128,
                   quantize=True)
        return
    full = "--full" in sys.argv
    # fastest-failing r4 repro first, under every flag set
    winners = []
    for tag, flags in FLAG_SETS.items():
        rec = run_config(tag, flags, 2, 1024, "attn", 128)
        if "pairs_per_sec" in rec:
            winners.append(tag)
    # regression check: the shipping headline under each winning flag set
    for tag in winners:
        if tag == "baseline":
            continue
        run_config(f"{tag}+headline", FLAG_SETS[tag], 1, 1024, "attn", 256)
    if full:
        # the remaining r4-dead configs under the first winner
        if winners:
            f = FLAG_SETS[winners[0]]
            for cfg in [(2, 1024, "full", 128), (1, 2048, "attn", 256),
                        (1, 2048, "acts", 256)]:
                run_config(f"{winners[0]}+{cfg}", f, *cfg)


if __name__ == "__main__":
    main()
