"""HTTP serving-daemon throughput on the real chip.

Drives the full `vlrlhf serve` stack IN-PROCESS (EngineServer + HTTP on an
ephemeral port + thread-pool clients) with a mixed-output-length text
workload at 7B int8 — the production serving claim (tok/s and req/s
through the endpoint) next to the in-process ContinuousEngine number from
BENCH (the delta is the HTTP + scheduler-thread overhead, which should be
noise at 7B decode speeds).

Usage: python tools/serve_bench.py [--reqs N] [--slots N] [--tiny]
    [--adapters N] [--no-fuse]
  --adapters N  register N r=64 LoRA sets and alternate requests across
                them — measures the multi-adapter serving tax (each set's
                delta computed once per step) vs the plain run
  --no-fuse     skip fuse_vlm_params (wqkv/gateup). Default is FUSED —
                the production `vlrlhf serve` layout (cli/main.py); with
                adapters the engine then also auto-fuses the sets
                (lora.fuse_adapter_sets, 14 -> 8 adapter matmuls/layer)
"""
import sys
import threading
import time

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request  # noqa: E402
from vlrlhf_tpu.generate.engine import GenerateConfig  # noqa: E402
from vlrlhf_tpu.generate.server import EngineServer  # noqa: E402


def main():
    n_reqs = int(sys.argv[sys.argv.index("--reqs") + 1]) if "--reqs" in sys.argv else 48
    n_slots = int(sys.argv[sys.argv.index("--slots") + 1]) if "--slots" in sys.argv else 16
    int8 = True  # forced: 7B bf16 does not fit a 16 GiB chip

    from vlrlhf_tpu.models.registry import FAMILIES, scale_down
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = FAMILIES["llava"].make_config()
    if "--tiny" in sys.argv:  # CPU smoke of the full path
        cfg, int8 = scale_down(cfg), False
    params = jax.jit(
        lambda k: quantize_params(init_vlm_params(cfg, k), bits=8)
    )(jax.random.PRNGKey(0)) if int8 else jax.jit(
        lambda k: init_vlm_params(cfg, k)
    )(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    prompt = 128
    gen_cfg = GenerateConfig(
        max_new_tokens=256, pad_token_id=0, eos_token_ids=(2,),
        kv_cache_dtype="int8",
    )
    n_ad = (int(sys.argv[sys.argv.index("--adapters") + 1])
            if "--adapters" in sys.argv else 0)
    adapter_sets = None
    if n_ad:
        from vlrlhf_tpu.lora.lora import LoraConfig, init_lora

        lcfg = LoraConfig(r=64, alpha=16.0, dropout=0.0,
                          target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
        # serving dtype: bf16 adapters (init_lora's f32 default is the
        # TRAINING master dtype; serving reads the adapters every step, so
        # f32 doubles their HBM stream and inserts converts before the
        # mixed matmuls)
        adapter_sets = [
            jax.jit(lambda k: init_lora(params, lcfg, k, dtype=cfg.lm.dtype))(
                jax.random.PRNGKey(40 + i)
            )
            for i in range(n_ad)
        ]
    fuse = "--no-fuse" not in sys.argv and "--tiny" not in sys.argv
    if fuse:
        from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params

        params = jax.jit(fuse_vlm_params, donate_argnums=0)(params)
    engine = ContinuousEngine(
        cfg, gen_cfg, n_slots=n_slots, cache_len=512,
        adapter_sets=adapter_sets,
    )
    # the engine keeps only the STACKED tree; at 7B r=64 the N original
    # sets are ~320 MB each — dropping them here is the difference between
    # fitting and ResourceExhausted at --adapters 4 on a 16 GiB chip
    del adapter_sets
    srv = EngineServer(engine, params).start()

    # text-only requests, mixed budgets uniform(16, 256) — the BENCH CB
    # workload shape, here pushed through submit() like HTTP clients would
    reqs = [
        Request(
            input_ids=rng.integers(5, 1000, (prompt,)).astype(np.int32),
            max_new_tokens=int(rng.integers(16, 257)),
            adapter_idx=(i % n_ad) if n_ad else 0,
        )
        for i in range(n_reqs)
    ]
    # warm compile: one request through the whole path
    srv.submit(reqs[0]).result(timeout=1200)

    t0 = time.perf_counter()
    futs = []
    def client(chunk):
        for r in chunk:
            futs.append(srv.submit(r))
    threads = [
        threading.Thread(target=client, args=(reqs[i::8],))
        for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    toks = sum(len(f.result(timeout=2400)) for f in futs)
    dt = time.perf_counter() - t0
    print(
        f"serve_bench: {n_reqs} reqs / {n_slots} slots int8={int8} "
        f"fused={fuse} adapters={n_ad}: "
        f"{dt:.1f} s, {toks} tokens, {toks/dt:.0f} tok/s, "
        f"{n_reqs/dt:.2f} req/s"
    )
    print("server stats:", srv.stats())
    srv.stop()


if __name__ == "__main__":
    main()
