"""Speculation on eval-SHAPED serving workloads: measured acceptance + net
speedup with the production gate on (VERDICT r4 weak #7 / next-item 7: both
shipped spec bounds were synthetic — echo-heavy 1.16-1.22x gated,
adversarial 0.94-0.96x — and acceptance on the workload the feature exists
for was never estimated).

Three workloads with the prompt/output GEOMETRY of the eval harness's
benchmarks (eval/benchmarks.py):
  - mme_short:  one 336px image + short question (608-token prompt),
                16 new tokens greedy — the MME/POPE shape (yes/no + short
                rationale); the eval bench segment's exact shape.
  - mmbench:    image prompt + ~24 extra option tokens, 32 new tokens
                greedy — choice-style with a longer answer tail.
  - caption:    image prompt, 128 new tokens greedy — open-ended
                description shape (MMVet/LLaVA-bench style lengths).
  - sampled_t02: the caption shape sampled at temperature 0.2 — the
                reference's InstructBLIP eval sampling temperature.

ACCEPTANCE IS MEASURED, NOT ASSERTED, and exactly — not via engine
telemetry: greedy spec is output-identical to plain greedy (up to the
measured 1-2 ulp tie-flips), so replaying the k=0 run's token streams
through the host drafting oracle (generate/speculative.prompt_lookup_draft,
the exact semantics of the device drafter) yields the true per-chunk
accepted-token distribution the engine saw. Net speedup is then a separate
wall-clock A/B (k=0 vs k=3 with the adaptive gate, the shipping default).

HONESTY CAVEAT (carried into the log line): prompt/output lengths are the
benchmarks'; the token STATISTICS are a random-init model's. Real VLM
answers repeat prompt n-grams more than random-init continuations do
(entities, option letters, OCR spans), so the measured acceptance is a
plausible FLOOR for echo-lite tasks, and the echo bound remains the
ceiling. What this probe establishes is (a) the true acceptance number for
each geometry under a fixed text distribution and (b) that the gate keeps
every geometry at >= ~parity, i.e. default-on speculation is not a
regression risk on short-answer eval serving.

Run: python tools/spec_vqa_probe.py [--workload NAME] (appends to
tools/r5_sweep_results.log)
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
LOG = os.path.join(HERE, "r5_sweep_results.log")

K = 3


def simulated_acceptance(prompt_ids, out_tokens, k=K):
    """Replay prompt-lookup drafting over the KNOWN greedy stream: at each
    K-chunk boundary the engine drafts from (prompt + emitted-so-far) and
    accepts the longest prefix matching the actual continuation. Returns
    (accepted_total, chunks, per-chunk histogram)."""
    from vlrlhf_tpu.generate.speculative import prompt_lookup_draft

    hist = list(map(int, prompt_ids)) + list(map(int, out_tokens))
    n_p = len(prompt_ids)
    accepted, chunks = 0, 0
    histo = [0] * (k + 1)
    pos = n_p + 1  # first response token comes from the prefill, not a burst
    while pos < len(hist):
        draft = prompt_lookup_draft(hist[:pos], k, -1)
        n_acc = 0
        for d in draft:
            if pos + n_acc < len(hist) and d == hist[pos + n_acc]:
                n_acc += 1
            else:
                break
        histo[n_acc] += 1
        accepted += n_acc
        chunks += 1
        pos += n_acc + 1  # accepted prefix + the model's own next token
    return accepted, chunks, histo


def build_requests(kind, cfg, n_requests, rng):
    from vlrlhf_tpu.generate.continuous import Request

    n_img = cfg.num_image_tokens
    img = cfg.vision.image_size
    pos = np.arange(2, 2 + n_img, dtype=np.int32)
    pixels = rng.integers(0, 255, (img, img, 3)).astype(np.float32) / 255.0
    text = {"mme_short": 32, "mmbench": 56, "caption": 32,
            "sampled_t02": 32}[kind]
    new = {"mme_short": 16, "mmbench": 32, "caption": 128,
           "sampled_t02": 128}[kind]
    reqs = []
    for _ in range(n_requests):
        ids = rng.integers(5, 30000, (n_img + text,)).astype(np.int32)
        ids[pos] = cfg.image_token_id
        reqs.append(Request(input_ids=ids, pixel_values=pixels,
                            image_positions=pos, max_new_tokens=new))
    return reqs, n_img + text, new


def run_workload(kind, cfg, params, n_requests=24, n_slots=8):
    from vlrlhf_tpu.generate.continuous import ContinuousEngine
    from vlrlhf_tpu.generate.engine import GenerateConfig

    rng = np.random.default_rng(17)
    reqs, L, n_new = build_requests(kind, cfg, n_requests, rng)
    sample = kind == "sampled_t02"

    def make(spec_k):
        return ContinuousEngine(
            cfg,
            GenerateConfig(max_new_tokens=n_new, pad_token_id=0,
                           kv_cache_dtype="int8", do_sample=sample,
                           temperature=0.2 if sample else 0.0),
            n_slots=n_slots, cache_len=-(-(L + n_new) // 128) * 128,
            prefill_chunk=128, max_prefill_group=4, speculative_k=spec_k,
        )

    def timed(spec_k):
        eng = make(spec_k)
        eng.warmup(params, reqs[0])
        t0 = time.perf_counter()
        out = eng.run(params, reqs,
                      rng=jax.random.PRNGKey(7) if sample else None)
        dt = time.perf_counter() - t0
        frac = (round(eng.last_spec_bursts / max(eng.last_bursts, 1), 3)
                if spec_k else None)
        del eng
        return dt, out, frac

    dt0, out0, _ = timed(0)
    dtk, outk, frac = timed(K)

    acc_tot, chunks, histo = 0, 0, [0] * (K + 1)
    for r, toks in zip(reqs, out0):
        a, c, h = simulated_acceptance(r.input_ids, toks)
        acc_tot += a
        chunks += c
        histo = [x + y for x, y in zip(histo, h)]
    rec = {
        "workload": kind, "n_requests": n_requests, "n_slots": n_slots,
        "prompt_len": L, "new_tokens": n_new, "speculative_k": K,
        "acceptance_per_chunk": round(acc_tot / max(chunks, 1), 3),
        "acceptance_histogram_0..k": histo,
        "tokens_per_spec_chunk": round(1 + acc_tot / max(chunks, 1), 3),
        "net_speedup_gated": round(dt0 / dtk, 3),
        "spec_burst_fraction": frac,
        "imgs_per_sec": {"k0": round(n_requests / dt0, 3),
                         "k": round(n_requests / dtk, 3)},
        "note": ("acceptance replayed exactly from the k=0 greedy stream "
                 "via the host drafting oracle; lengths are benchmark-"
                 "shaped, token statistics are random-init (plausible "
                 "floor for echo-lite tasks)"),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(f"[r5 spec_vqa] {line}\n")
    return rec


def main():
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    only = (sys.argv[sys.argv.index("--workload") + 1]
            if "--workload" in sys.argv else None)
    cfg = FAMILIES["llava"].make_config()
    params = jax.jit(
        lambda k: quantize_params(init_vlm_params(cfg, k))
    )(jax.random.PRNGKey(0))
    for kind in ("mme_short", "mmbench", "caption", "sampled_t02"):
        if only and kind != only:
            continue
        run_workload(kind, cfg, params)


if __name__ == "__main__":
    main()
