"""Judge co-residency memory plan + smoke on ONE 16 GiB v5e.

VERDICT r2 weak item 6: EngineJudge loads the judge model in-process next to
the eval model (eval/judge.py); two 7B models fit one v5e only with int8 on
both. This tool DEMONSTRATES the fitting config end to end on the real chip
(measured budget, 15.75 GiB HBM − 0.26 reserved ≈ 15.5 usable):

  eval model : llava-7B VLM, int8 weights            7.01 GiB (measured)
  judge model: the LM trunk only, int8               6.40 GiB (judging is
               text-only — the CLI drops the judge's vision/projector)
  eval cache : B=8 x 640 slots, int8 KV + scales     1.42 GiB
  judge cache: B=8 x 256 text slots, int8 KV         0.57 GiB
  headroom   : ~0.1 GiB + freed-between-dispatch activation transients

bf16 KV at these shapes would be 5.9 GiB (the MHA llama cache is 32 kv
heads x 128) — int8 KV is what makes co-residency possible at all.

Smoke: batched eval generation -> choice-extraction judging of the decoded
responses through the judge engine — the exact MMBench/SEED-gen flow
(eval/judge.py judge_unresolved). Prints per-phase device memory stats.

The matching CLI recipe is recipes/eval/eval_mmbench_judge_1v5e.sh:
  --quantize true + --kv_cache_dtype int8 (applied to BOTH the eval model
  and the judge load; the judge keeps only params['lm']).

Usage: python tools/judge_coresidency.py
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.models.registry import FAMILIES
from vlrlhf_tpu.models.vlm import init_vlm_params
from vlrlhf_tpu.ops.quant import (
    DEFAULT_QUANT_PATTERNS,
    SERVE_QUANT_PATTERNS_WIDE,
    quantize_params,
)


def mem(tag):
    s = None
    try:
        s = jax.local_devices()[0].memory_stats()
    except Exception:  # noqa: BLE001 — not all PJRT plugins implement it
        pass
    if s:
        used = s.get("bytes_in_use", 0) / 2**30
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        print(f"  [{tag}] in_use={used:.2f} GiB peak={peak:.2f} GiB")
    else:
        # axon tunnel: no memory_stats — account live arrays instead
        # (transient activation peaks not visible, but weights/caches are)
        live = sum(x.nbytes for x in jax.live_arrays()) / 2**30
        print(f"  [{tag}] live_arrays={live:.2f} GiB (memory_stats n/a)")


def _init_quantized(cfg, key, patterns, lm_only=False):
    """Init a model DIRECTLY at its quantized dtypes — every leaf is born
    int8/bf16 at its final shape inside one jit, so the device transient is
    the final tree, NOT a full bf16 model (13.2 GiB at 7B) that then
    quantizes. This mirrors the production path exactly: load_model_bundle
    quantize-during-port streams int8 layers to device and never
    materializes the bf16 stack (utils/hf_port.port_quantize) — which is
    the only way a second 7B loads next to a resident one.

    Synthetic values (random int8 codes, constant scales/norm weights):
    co-residency is a MEMORY and THROUGHPUT demonstration; timings on TPU
    are data-independent."""
    shapes = jax.eval_shape(
        lambda k: quantize_params(
            {"lm": init_vlm_params(cfg, k)["lm"]}
            if lm_only
            else init_vlm_params(cfg, k),
            patterns,
        ),
        key,
    )

    def one(i, s):
        if s.dtype == jnp.int8:
            return jax.random.randint(
                jax.random.fold_in(key, i), s.shape, -16, 17, jnp.int32
            ).astype(jnp.int8)
        return jnp.full(s.shape, 0.0157, s.dtype)  # ~2/127: sane magnitudes

    leaves, treedef = jax.tree.flatten(shapes)
    init = jax.jit(
        lambda: treedef.unflatten(
            [one(i, s) for i, s in enumerate(leaves)]
        )
    )
    return init()


def main():
    assert jax.default_backend() == "tpu"
    # ---- eval model: llava-7B VLM, int8 ----
    cfg_eval = FAMILIES["llava"].make_config()
    params_eval = _init_quantized(
        cfg_eval, jax.random.PRNGKey(0), SERVE_QUANT_PATTERNS_WIDE
    )
    jax.block_until_ready(params_eval)
    mem("eval model loaded (int8 wide)")

    # ---- judge model: a second 7B LM trunk, int8. Judging is text-only,
    # so the CLI drops the judge's vision/projector at load (cli/main.py
    # cmd_eval) — mirrored here: only params["lm"] is ever built ----
    cfg_judge = FAMILIES["llava"].make_config()
    params_judge = _init_quantized(
        cfg_judge, jax.random.PRNGKey(1), DEFAULT_QUANT_PATTERNS,
        lm_only=True,
    )
    jax.block_until_ready(params_judge)
    mem("judge model loaded (int8, lm-only)")

    # ---- eval generation pass ----
    b, n_img, text = 8, cfg_eval.num_image_tokens, 32
    L = n_img + text
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, (b, L)).astype(np.int32)
    pos = np.broadcast_to(np.arange(2, 2 + n_img, dtype=np.int32), (b, n_img))
    for i in range(b):
        ids[i, pos[i]] = cfg_eval.image_token_id
    img = cfg_eval.vision.image_size
    eval_batch = {
        "input_ids": ids,
        "pad_mask": np.ones((b, L), bool),
        "prompt_lens": np.full((b,), L, np.int32),
        "pixel_values": rng.integers(0, 255, (b, 1, img, img, 3)).astype(
            np.float32
        ) / 255.0,
        "image_positions": np.asarray(pos),
    }
    gen_eval = Generator(
        cfg_eval, GenerateConfig(max_new_tokens=32, pad_token_id=0,
                                 kv_cache_dtype="int8")
    )
    t0 = time.perf_counter()
    toks = gen_eval(params_eval, eval_batch)
    _ = int(jnp.sum(toks))
    print(f"eval generation: {b} rows in {time.perf_counter() - t0:.1f}s "
          "(incl. compile)")
    mem("after eval generation")

    # ---- judge pass over the responses (text-only prompts) ----
    jb, jl = 8, 248  # 248 + 8 new -> a 256-slot cache (128-aligned)
    jids = rng.integers(5, 30000, (jb, jl)).astype(np.int32)
    judge_batch = {
        "input_ids": jids,
        "pad_mask": np.ones((jb, jl), bool),
        "prompt_lens": np.full((jb,), jl, np.int32),
        "pixel_values": None,
        "image_positions": None,
    }
    gen_judge = Generator(
        cfg_judge, GenerateConfig(max_new_tokens=8, pad_token_id=0,
                                  kv_cache_dtype="int8")
    )
    t0 = time.perf_counter()
    jt = gen_judge(params_judge, judge_batch)
    _ = int(jnp.sum(jt))
    print(f"judge extraction: {jb} rows in {time.perf_counter() - t0:.1f}s "
          "(incl. compile)")
    mem("after judge pass")

    # alternate to prove steady-state co-residency (no realloc churn)
    for _ in range(2):
        toks = gen_eval(params_eval, eval_batch, rng=jax.random.PRNGKey(3))
        jt = gen_judge(params_judge, judge_batch, rng=jax.random.PRNGKey(4))
    _ = int(jnp.sum(toks)) + int(jnp.sum(jt))
    mem("steady state (2 alternating rounds)")
    print("judge co-residency smoke OK: two int8 7B stacks + caches on one "
          "chip")

    # ---- benchmark-scale sustained run (VERDICT r3 next-item 7): a few
    # hundred MMBench-style rows alternating generate/judge — the 8-row
    # smoke could not rule out a transient OOM mid-benchmark; this can.
    # Fresh host-built prompts per batch (new ids/pixels each iteration,
    # like a real benchmark's data loader) so the allocator sees the real
    # churn pattern, not one cached pair of input buffers. ----
    if "--rows" in sys.argv:
        n_rows = int(sys.argv[sys.argv.index("--rows") + 1])
        n_batches = -(-n_rows // b)
        t0 = time.perf_counter()
        done = 0
        for step in range(n_batches):
            ids = rng.integers(5, 30000, (b, L)).astype(np.int32)
            for i in range(b):
                ids[i, pos[i]] = cfg_eval.image_token_id
            eval_batch = dict(
                eval_batch,
                input_ids=ids,
                pixel_values=rng.integers(
                    0, 255, (b, 1, img, img, 3)
                ).astype(np.float32) / 255.0,
            )
            toks = gen_eval(params_eval, eval_batch,
                            rng=jax.random.PRNGKey(100 + step))
            judge_batch = dict(
                judge_batch,
                input_ids=rng.integers(5, 30000, (jb, jl)).astype(np.int32),
            )
            jt = gen_judge(params_judge, judge_batch,
                           rng=jax.random.PRNGKey(500 + step))
            # fetch both (forces execution through the tunnel each round)
            _ = int(jnp.sum(toks)) + int(jnp.sum(jt))
            done += b
            if (step + 1) % 8 == 0:
                dt = time.perf_counter() - t0
                print(f"  sustained: {done}/{n_rows} rows "
                      f"{done / dt:.2f} rows/s (gen+judge)")
                mem(f"sustained @{done}")
        dt = time.perf_counter() - t0
        mem("sustained end")
        print(f"sustained co-residency OK: {done} rows alternating "
              f"generate(32 new)/judge(8 new) in {dt:.0f}s "
              f"({done / dt:.2f} rows/s), zero OOM")


if __name__ == "__main__":
    main()
