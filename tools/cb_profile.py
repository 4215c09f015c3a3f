"""Break down where the continuous-batching serving time goes at the exact
BENCH serving workload (48 reqs / 16 slots / prompt 608 / outputs
uniform(16,256), 7B int8 W+KV): per-dispatch admit (prefill) time, burst
time, tokens per burst, and host turnaround gaps.

Methodology: wraps ContinuousEngine._admit_group/_burst with a blocking
fetch after each dispatch. The per-dispatch sync adds tunnel RTT to every
round (so the TOTAL here is slower than the real engine run — use the
shares, not the sum), but device-side durations are accurate.

Run: python tools/cb_profile.py [--slots 16] [--requests 48]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--exit_free", type=int, default=2)
    ap.add_argument("--max_prefill_group", type=int, default=4)
    ap.add_argument("--speculative_k", type=int, default=0)
    args = ap.parse_args()

    from bench import _measure_serving_cb  # noqa: F401  (same config source)
    from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
    from vlrlhf_tpu.generate.engine import GenerateConfig
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = FAMILIES["llava"].make_config()
    params = jax.jit(
        lambda k: quantize_params(init_vlm_params(cfg, k))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    text_len = 32
    L = n_img + text_len
    img = cfg.vision.image_size
    max_new = 256
    n_requests = args.requests
    stops = rng.integers(16, max_new + 1, n_requests)
    pos = np.arange(2, 2 + n_img, dtype=np.int32)
    pixels = rng.integers(0, 255, (img, img, 3)).astype(np.float32) / 255.0
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 30000, (L,)).astype(np.int32)
        ids[pos] = cfg.image_token_id
        reqs.append(Request(input_ids=ids, pixel_values=pixels,
                            image_positions=pos,
                            max_new_tokens=int(stops[i])))

    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=max_new, pad_token_id=0,
                            kv_cache_dtype="int8"),
        n_slots=args.slots, cache_len=1024, prefill_chunk=128,
        max_prefill_group=args.max_prefill_group,
        exit_free=args.exit_free, speculative_k=args.speculative_k,
    )
    eng.warmup(params, reqs[0])

    rec = {"admit": [], "burst": [], "burst_tokens": [], "host_gap": [],
           "admit_rows": []}
    t_last_done = [None]

    orig_admit = eng._admit_group
    orig_burst = eng._burst

    def timed_admit(params, cache, pending, state, hist, group, requests,
                    rng_):
        if t_last_done[0] is not None:
            rec["host_gap"].append(time.perf_counter() - t_last_done[0])
            t_last_done[0] = None
        t0 = time.perf_counter()
        out = orig_admit(params, cache, pending, state, hist, group,
                         requests, rng_)
        jnp.asarray(out[2]).block_until_ready()
        _ = int(jnp.sum(out[2]))  # fetch: tunnel has no block sync
        rec["admit"].append(time.perf_counter() - t0)
        rec["admit_rows"].append(len(group))
        return out

    def timed_burst(params, cache, pending, state, hist, rng_, exit_free,
                    slot_aidx, spec=None):
        if t_last_done[0] is not None:
            rec["host_gap"].append(time.perf_counter() - t_last_done[0])
        t0 = time.perf_counter()
        out = orig_burst(params, cache, pending, state, hist, rng_,
                         exit_free, slot_aidx, spec=spec)
        packed = np.asarray(out[-1])
        t1 = time.perf_counter()
        rec["burst"].append(t1 - t0)
        t_last_done[0] = t1
        lens0 = packed[:, -1]
        rec["burst_tokens"].append(int(np.sum(lens0)) )
        return out

    eng._admit_group = timed_admit
    eng._burst = timed_burst

    t0 = time.perf_counter()
    out = eng.run(params, reqs)
    total = time.perf_counter() - t0
    useful = sum(len(o) for o in out)

    adm, bur = np.asarray(rec["admit"]), np.asarray(rec["burst"])
    gaps = np.asarray(rec["host_gap"])
    print(f"total           {total:8.2f} s   ({n_requests/total:.3f} imgs/s"
          f" WITH per-dispatch sync overhead)")
    print(f"useful tokens   {useful}")
    print(f"admit dispatches {len(adm):4d}  sum {adm.sum():7.2f} s  "
          f"mean {1e3*adm.mean():6.1f} ms  rows/admit "
          f"{np.mean(rec['admit_rows']):.2f}")
    print(f"burst dispatches {len(bur):4d}  sum {bur.sum():7.2f} s  "
          f"mean {1e3*bur.mean():6.1f} ms")
    print(f"host gaps        {len(gaps):4d}  sum {gaps.sum():7.2f} s  "
          f"mean {1e3*gaps.mean():6.1f} ms")
    # tokens emitted per burst (from device length advance)
    dl = np.asarray(rec["burst_tokens"])
    adv = np.diff(dl)
    print(f"cum-length advance per burst: mean {adv.mean():.0f} "
          f"min {adv.min()} max {adv.max()}")
    print(f"accounted: admit {100*adm.sum()/total:.0f}%  "
          f"burst {100*bur.sum()/total:.0f}%  gaps {100*gaps.sum()/total:.0f}%")


if __name__ == "__main__":
    main()
