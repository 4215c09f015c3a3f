"""Benchmark: DPO preference-pairs/sec/chip at the 7B north-star shape.

Measures the full jitted DPO step at three configs on the attached chip:
  - HEADLINE: LLaVA-1.5-7B geometry (hidden 4096 / 32L / ff 11008 + CLIP-L
    tower; 7.06B params = 13.2 GiB bf16), LoRA r64, seq 1024, precomputed
    ref logps (--precompute_ref_logps mode: the in-step ref forward is
    skipped), 'attn' remat + chunked lm_head (logits_chunk=256 — the margin
    that lets 'attn' fit in bf16). Largest fitting batch on a 16GB v5e is
    1 pair/step (BASELINE.md north star is pairs/sec/chip AT 7B).
  - qlora_int8_7b: same geometry with the int8 frozen base (--q_lora,
    ops/quant.py) + remat_policy 'acts' — the fastest 7B training mode
    (halved param HBM pays for saving all per-layer activations).
  - continuity: the round-1 1.5B flagship at 4 pairs/step with an online
    (in-step, adapter-off) ref forward, remat 'acts'.

MFU accounting (train/flops.py): LoRA-adapter training is 4N fwd+bwd (the
frozen base has no dL/dW matmuls) + 2N per online ref forward — round 1 used
6N+2N, inflating its MFU. `vs_baseline` is 0.0: the reference publishes NO
throughput numbers (BASELINE.json.published == {}); the explicit
`mfu_vs_40pct_target` field carries the only quantitative target we have.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

PEAK_BF16_FLOPS = {
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
}


def _compile_cache():
    # TPU only: cached XLA:CPU AOT artifacts are machine-feature-specific
    # and SIGILL when loaded on a mismatched host (see cli/main.py).
    try:
        import os

        if jax.default_backend() != "tpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def _anyres_example_batch(cfg, n_pairs, seq, img_px=672, key=None):
    """DPO batch at the REAL LLaVA-Next anyres training geometry: an
    img_px-square image -> base tile + unpadded grid tiles + newline tokens
    (the reference packs ~2880 image tokens for a 672px image,
    models/LlavaNext/__init__.py:213-232 — round 2 benched llava_next at a
    single-tile 576-token shape, VERDICT r2 weak item 2)."""
    import numpy as np

    from vlrlhf_tpu.models.anyres import DEFAULT_GRID_PINPOINTS, anyres_plan

    tile = cfg.vision.image_size
    plan = anyres_plan(
        (img_px, img_px), cfg.grid_pinpoints or DEFAULT_GRID_PINPOINTS,
        tile, tile // cfg.vision.patch_size,
    )
    n_tok, n_tiles = plan["n_tokens"], plan["n_tiles"]
    assert n_tok + 2 < seq, (n_tok, seq)
    rng = np.random.default_rng(0)
    b2 = 2 * n_pairs
    ids = rng.integers(0, cfg.lm.vocab_size - 2, (b2, seq)).astype(np.int32)
    pos = np.broadcast_to(
        np.arange(2, 2 + n_tok, dtype=np.int32), (b2, n_tok)
    ).copy()
    for i in range(b2):
        ids[i, pos[i]] = cfg.image_token_id
    start = n_tok + 8  # completion begins after the packed image tokens
    labels = np.where(np.arange(seq)[None] >= start, ids, -100).astype(np.int64)
    pixels = rng.normal(size=(n_pairs, n_tiles, tile, tile, 3)).astype(
        np.float32
    )
    gather = np.broadcast_to(plan["gather"][None], (n_pairs, n_tok)).copy()
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "pad_mask": jnp.ones((b2, seq), bool),
        "pixel_values": jnp.asarray(pixels, cfg.lm.dtype),
        "image_positions": jnp.asarray(pos),
        "anyres_gather": jnp.asarray(gather),
    }, n_tok, n_tiles


def _measure_dpo(cfg, n_pairs, seq, n_steps, n_warmup, precompute_ref,
                 quantize=False, dpo_kwargs=None, quant_patterns=None,
                 with_plora=False, anyres_px=0, bits=8):
    """Returns (pairs_per_sec, step_ms, mfu, params_b). NOTE:
    block_until_ready does not synchronize over the axon tunnel; fetching a
    value does."""
    import numpy as np

    import __graft_entry__ as graft
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.train import flops as F
    from vlrlhf_tpu.train.dpo import DPOConfig, make_dpo_step
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )

    n_params = sum(
        int(np.prod(s.shape))
        for s in jax.tree_util.tree_leaves(
            jax.eval_shape(lambda k: init_vlm_params(cfg, k), jax.random.PRNGKey(0))
        )
    )
    # One compiled init program: eager per-op init is pathological over the
    # axon RPC tunnel (~15 ms/dispatch). QLoRA mode quantizes inside the same
    # program so XLA never holds bf16 stack + int8 stack at once.
    if quantize:
        from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS, quantize_params

        pats = quant_patterns or TRAIN_QUANT_PATTERNS
        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k), pats,
                                      bits=bits)
        )(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    if with_plora:
        # XC2 ships ~590M params of TRAINED built-in PLoRA (r=256) that ride
        # in every forward at image positions; include an equivalently-shaped
        # tree so the capacity/throughput numbers reflect the real model.
        plora_cfg = LoraConfig(
            r=256, alpha=256.0,
            target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"),
        )
        params["plora"] = jax.jit(
            lambda k: init_lora(params, plora_cfg, k, dtype=cfg.lm.dtype)
        )(jax.random.PRNGKey(7))
    lcfg = LoraConfig(
        r=64, alpha=16.0, target_patterns=(r"lm/.*attn/", r"lm/.*mlp/")
    )
    adapters = jax.jit(
        lambda k: init_lora(params, lcfg, k, dtype=cfg.lm.dtype)
    )(jax.random.PRNGKey(1))
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-5, warmup_steps=1, total_steps=100),
        adapters,
    )
    state = init_train_state(adapters, tx)
    step = make_dpo_step(
        cfg, DPOConfig(lora_scale=lcfg.scale, **(dpo_kwargs or {})), tx
    )
    if anyres_px:
        batch, _, n_tiles = _anyres_example_batch(cfg, n_pairs, seq, anyres_px)
    else:
        batch = graft._example_batch(cfg, n_pairs=n_pairs, seq=seq)
        n_tiles = 1
    if precompute_ref:
        batch["ref_chosen_logps"] = jnp.zeros((n_pairs,), jnp.float32)
        batch["ref_rejected_logps"] = jnp.zeros((n_pairs,), jnp.float32)

    state, metrics = step(state, params, batch)  # compile
    float(metrics["loss"])
    for _ in range(n_warmup):
        state, metrics = step(state, params, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, params, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    tokens = 2 * n_pairs * seq
    total_flops = (
        F.dpo_flops_per_token(
            cfg, seq, ref_forward=not precompute_ref, train_mode="adapter"
        )
        * tokens
        + F.vision_flops_per_image(cfg.vision) * n_pairs * n_tiles
    )
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16_FLOPS.get(gen, 197e12)
    mfu = total_flops / dt / peak
    return n_pairs / dt, dt * 1e3, mfu, n_params / 1e9


def _peak_flops():
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return PEAK_BF16_FLOPS.get(gen, 197e12)


def _measure_eval_15b():
    """1.5B eval continuity rider, ISOLATED in its own segment/subprocess
    (VERDICT r4 weak #8: the number moved 96.2 -> 80.9 between r3's driver
    run and an r4 in-process re-run; segment adjacency skews it the same
    way it skews the serving comparison — isolation is the fix, and the
    default bench no longer rides it inside the 7B eval segment)."""
    import __graft_entry__ as graft
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.vlm import init_vlm_params

    cfg = graft._flagship_config(tiny=False)
    params = jax.jit(lambda k: init_vlm_params(cfg, k))(jax.random.PRNGKey(0))
    bsz, prompt_len, n_new = 32, 128, 16
    batch = graft._example_batch(cfg, n_pairs=bsz // 2, seq=prompt_len)
    gen_batch = {
        "input_ids": batch["input_ids"][:bsz],
        "pad_mask": batch["pad_mask"][:bsz],
        "prompt_lens": jnp.full((bsz,), prompt_len, jnp.int32),
        "pixel_values": jnp.concatenate(
            [batch["pixel_values"], batch["pixel_values"]], 0
        )[:bsz],
        "image_positions": batch["image_positions"][:bsz],
    }
    gen = Generator(cfg, GenerateConfig(max_new_tokens=n_new, pad_token_id=0))
    t = gen(params, gen_batch)
    _ = int(jnp.sum(t))
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        t = gen(params, gen_batch, rng=jax.random.PRNGKey(1))
    _ = int(jnp.sum(t))
    dt = (time.perf_counter() - t0) / n_iters
    return {
        "imgs_per_sec": round(bsz / dt, 3), "batch": bsz,
        "prompt_len": prompt_len, "new_tokens": n_new,
        "model": "1.5b flagship bf16",
    }


def _measure_eval_7b(n_requests=48, n_slots=16):
    """The north-star eval number AT THE NORTH-STAR SCALE (VERDICT r3
    next-item 6: BASELINE names 'MME eval imgs/sec' and r3 measured it on a
    1.5B toy). MME-shaped workload: 7B int8 W+KV, one 336px image + short
    question (608-token prompt), 16 new tokens greedy (MME answers are
    yes/no + rationale head), continuous batching on."""
    import numpy as np

    from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
    from vlrlhf_tpu.generate.engine import GenerateConfig
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params

    cfg = FAMILIES["llava"].make_config()
    # fused wqkv/gateup: the production serving layout (recipes/serve_*,
    # +21% CB tok/s same-window r5 A/B — [r5 serve_adapters_fused])
    params = jax.jit(
        lambda k: fuse_vlm_params(quantize_params(init_vlm_params(cfg, k)))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    L = n_img + 32
    img = cfg.vision.image_size
    n_new = 16
    pos = np.arange(2, 2 + n_img, dtype=np.int32)
    pixels = rng.integers(0, 255, (img, img, 3)).astype(np.float32) / 255.0
    reqs = []
    for _ in range(n_requests):
        ids = rng.integers(5, 30000, (L,)).astype(np.int32)
        ids[pos] = cfg.image_token_id
        reqs.append(Request(input_ids=ids, pixel_values=pixels,
                            image_positions=pos))
    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=n_new, pad_token_id=0,
                            kv_cache_dtype="int8"),
        n_slots=n_slots, cache_len=640, prefill_chunk=128,
        max_prefill_group=4,
    )
    eng.warmup(params, reqs[0])
    t0 = time.perf_counter()
    out = eng.run(params, reqs)
    dt = time.perf_counter() - t0
    assert all(len(o) > 0 for o in out)
    return {
        "imgs_per_sec": round(n_requests / dt, 3),
        "n_requests": n_requests, "n_slots": n_slots,
        "prompt_len": L, "new_tokens": n_new,
        "continuous_batching": True, "fused_decode": True,
        "model": "llava-7b geometry, int8 weights + int8 KV (MME-shaped)",
    }


def _measure_serving_cb(n_requests=48, n_slots=16, seed=0):
    """Continuous batching vs static batching, 7B int8 weights, mixed output
    lengths (the sglang-role workload: stragglers idle static slots;
    continuous refills them — VERDICT r2 item 2, target >=1.3x).

    Scheduler knobs come from the environment so the on-chip sweep
    (tools/r4_cb_sweep.py) can run this exact segment, subprocess-isolated,
    at each config: CB_EXIT_FREE, CB_GROUP, CB_CHUNK, CB_SLOTS, CB_SKIP_STATIC
    (reuse a known static baseline instead of re-timing it every config)."""
    import os

    import numpy as np

    exit_free = int(os.environ.get("CB_EXIT_FREE", "2"))
    group = int(os.environ.get("CB_GROUP", "4"))
    chunk = int(os.environ.get("CB_CHUNK", "128"))
    n_slots = int(os.environ.get("CB_SLOTS", str(n_slots)))
    skip_static = float(os.environ.get("CB_SKIP_STATIC", "0"))
    # min-of-2 by default: the CB side interleaves ~100 host scheduling
    # turns and a background wakeup only ever ADDS time — the r5 full runs
    # drew 1.125x..1.34x for identical device work on a single pass. One
    # extra CB pass (~+60-100 s warm) buys a draw-resistant ratio, and the
    # streamed/budgeted bench has the slack (r5 full run: 1515 s of 2340).
    # CB_BEST_OF=1 restores single-pass for tight sweeps.
    best_of = int(os.environ.get("CB_BEST_OF", "2"))

    from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params

    cfg = FAMILIES["llava"].make_config()
    # fused layout on BOTH engines (production serving default, r5 +21%;
    # the CB-vs-static ratio compares like with like)
    params = jax.jit(
        lambda k: fuse_vlm_params(quantize_params(init_vlm_params(cfg, k)))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens  # 576
    text_len = 32
    L = n_img + text_len
    img = cfg.vision.image_size
    cache_len = 1024
    max_new = 256
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

    # int8 KV on BOTH engines: at 16 slots the bf16 cache alone would blow
    # the chip, and halved cache reads speed every decode step
    # ---- static baseline: batches of n_slots; every batch decodes to its
    # straggler's length (rounded to a 64 bucket to bound compilations) ----
    def _bucket(n):
        return -(-n // 64) * 64

    gens: dict[int, Generator] = {}

    def _gen_for(mx):
        if mx not in gens:
            gens[mx] = Generator(
                cfg, GenerateConfig(max_new_tokens=mx, pad_token_id=0,
                                    kv_cache_dtype="int8")
            )
        return gens[mx]

    static_batches = []
    for s in range(0, n_requests, n_slots):
        part = reqs[s : s + n_slots]
        mx = _bucket(max(r.max_new_tokens for r in part))
        b = len(part)
        batch = {
            "input_ids": np.stack([r.input_ids for r in part]),
            "pad_mask": np.ones((b, L), bool),
            "prompt_lens": np.full((b,), L, np.int32),
            "pixel_values": np.stack([r.pixel_values[None] for r in part]),
            "image_positions": np.stack([r.image_positions for r in part]),
        }
        static_batches.append((mx, batch))
    if skip_static:
        static_dt = n_requests / skip_static  # sweep mode: known baseline
    else:
        for mx, batch in static_batches:  # warm each distinct program
            t = _gen_for(mx)(params, batch)
        _ = int(jnp.sum(t))
        static_dt = float("inf")  # same estimator as the CB side
        for _ in range(best_of):
            t0 = time.perf_counter()
            for mx, batch in static_batches:
                t = _gen_for(mx)(params, batch)
            _ = int(jnp.sum(t))
            static_dt = min(static_dt, time.perf_counter() - t0)

    # ---- continuous engine ----
    eng = ContinuousEngine(
        cfg, GenerateConfig(max_new_tokens=max_new, pad_token_id=0,
                            kv_cache_dtype="int8"),
        n_slots=n_slots, cache_len=cache_len, prefill_chunk=chunk,
        max_prefill_group=group,  # int8 KV scratch is small
        exit_free=exit_free,
    )
    eng.warmup(params, reqs[0])  # compile every group size + burst
    # min-of-N estimator: the CB run interleaves ~100 host-side scheduling
    # turns with device bursts, so on this 1-CPU host any background wakeup
    # inflates wall time (observed spread 3.30-3.60 imgs/s across isolated
    # runs of the SAME deterministic workload; the 3-dispatch static
    # baseline reproduces to 0.1%). Noise only ever ADDS time -> min is the
    # honest estimator (timeit's rationale). Device work is identical every
    # pass. Default is SINGLE-pass to fit the driver budget — the
    # variance_note below carries the spread so a single draw is readable.
    cb_dt = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        out = eng.run(params, reqs)
        cb_dt = min(cb_dt, time.perf_counter() - t0)
    useful = int(sum(len(o) for o in out))
    return {
        "imgs_per_sec": round(n_requests / cb_dt, 3),
        "static_imgs_per_sec": round(n_requests / static_dt, 3),
        "cb_speedup": round(static_dt / cb_dt, 3),
        "cb_best_of": best_of,
        "variance_note": (
            "single-pass draw; isolated re-runs of this deterministic "
            "workload spread ~3.30-3.60 CB imgs/s on this 1-CPU host "
            "(host-wakeup noise; static side reproduces to 0.1%) — r4 "
            "controlled A/B: 1.328x, history in tools/r4_sweep_results.log"
        ) if best_of == 1 else None,
        "useful_tok_per_sec": round(useful / cb_dt, 1),
        "n_requests": n_requests, "n_slots": n_slots,
        "exit_free": exit_free, "max_prefill_group": group,
        "prefill_chunk": chunk,
        "prompt_len": L, "max_new": max_new,
        "output_lens": "uniform(16,256)", "fused_decode": True,
        "model": "llava-7b geometry, int8 weights + int8 KV",
    }


def _measure_ppo_7b():
    """7B int8 PPO segment: rollout tok/s, stats/update ms, e2e steps/s
    (VERDICT r2 weak item 4: PPO had zero TPU performance evidence)."""
    import numpy as np

    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS, quantize_params
    from vlrlhf_tpu.train import flops as F
    from vlrlhf_tpu.train.ppo import PPOConfig, make_ppo_fns, rollout_to_batch
    from vlrlhf_tpu.train.train_state import (
        OptimizerConfig,
        init_train_state,
        make_optimizer,
    )
    import dataclasses

    import os

    # Remat/rollout knobs from the environment so the r4 on-chip sweep can
    # drive this exact segment per config (VERDICT r3 next-item 2: PPO got
    # no equivalent of the DPO remat sweep). r3 shipped 'attn' because
    # 'acts' + DENSE (B,L,V) logits compile-OOMed; the chunked-logps path
    # (logits_chunk=256 below) changes that fitting math — sweep it.
    remat = os.environ.get("PPO_REMAT", "attn")
    # cb = the shipping default: slot-refill rollouts with eos stopping
    # measured FASTER than fixed-length static rollouts on chip (1666 vs
    # 1910 ms at this workload -> e2e 0.4954 vs 0.4775 MFU) — uneven
    # response lengths are exactly what slot refills exploit.
    rollout_mode = os.environ.get("PPO_ROLLOUT", "cb")
    # r4 sweep dims: the full-batch-only update at 'attn' was the r3 MFU
    # ceiling (36.5%); the production loop (run_ppo_updates) already does
    # TRL minibatching — the bench now exercises it. A SMALLER update
    # minibatch refits the memory-hungry fast remat policies ('acts' paid
    # 1.35x over 'attn' per token in the DPO sweeps) without changing TRL
    # semantics (mini_batch_size, trl 0.8.1).
    # Shipping defaults = the r4 on-chip sweep winner (tools/
    # r4_sweep_results.log): batch 8, minibatch 2, update remat 'acts' ->
    # 0.4775 e2e MFU (update 344 ms vs 2023 at full-batch 'attn'); mb=4/
    # 'mlp1' gave 0.4231, mb=4/'acts' and batch 16 variants compile-OOM.
    b = int(os.environ.get("PPO_BATCH", "8"))
    mb = int(os.environ.get("PPO_MINIBATCH", "2")) or b
    update_remat = os.environ.get("PPO_UPDATE_REMAT", "acts")

    cfg = FAMILIES["llava"].make_config()
    cfg = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, remat_policy=remat)
    )
    cfg_update = dataclasses.replace(
        cfg, lm=dataclasses.replace(cfg.lm, remat_policy=update_remat)
    )
    params = jax.jit(
        lambda k: quantize_params(init_vlm_params(cfg, k), TRAIN_QUANT_PATTERNS)
    )(jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=64, alpha=16.0,
                      target_patterns=(r"lm/.*attn/", r"lm/.*mlp/"))
    adapters = jax.jit(
        lambda k: init_lora(params, lcfg, k, dtype=cfg.lm.dtype)
    )(jax.random.PRNGKey(1))
    trainable = {
        "adapters": adapters,
        "v_head": {"kernel": jnp.zeros((cfg.lm.hidden_size, 1))},
    }
    ocfg = OptimizerConfig(learning_rate=1e-5, warmup_steps=1, total_steps=100)
    tx = make_optimizer(ocfg, trainable)
    state = init_train_state(trainable, tx)
    ppo_cfg = PPOConfig(lora_scale=lcfg.scale, logits_chunk=256)
    stats_fn, _ = make_ppo_fns(cfg, ppo_cfg, tx)
    _, update_fn = make_ppo_fns(cfg_update, ppo_cfg, tx)

    n_new = 64
    n_img = cfg.num_image_tokens
    L = n_img + 32  # VQA-style prompt: one image + short question
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, (b, L)).astype(np.int32)
    pos = np.broadcast_to(np.arange(2, 2 + n_img, dtype=np.int32), (b, n_img))
    for i in range(b):
        ids[i, pos[i]] = cfg.image_token_id
    img = cfg.vision.image_size
    pb = {
        "input_ids": ids,
        "pad_mask": np.ones((b, L), bool),
        "prompt_lens": np.full((b,), L, np.int32),
        "pixel_values": rng.integers(0, 255, (b, 1, img, img, 3)).astype(
            np.float32
        ) / 255.0,
        "image_positions": np.asarray(pos),
    }
    resp_lens = None
    if rollout_mode == "cb":
        # Slot-refill rollouts with eos stopping (the r3 feature the r3
        # bench never measured): random-init weights never emit one
        # specific eos id under sampling, so "response ends" is modeled as
        # a 512-id stop SET (P(stop) ~ 512/32000 = 1.6%/token => geometric
        # lengths, mean ~46 under the 64 cap) — spread lengths are exactly
        # what slot refills exploit; labeled in the output JSON.
        from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request

        gcfg = GenerateConfig(
            max_new_tokens=n_new, do_sample=True, temperature=1.0,
            pad_token_id=0, eos_token_ids=tuple(range(3, 515)),
        )
        cb = ContinuousEngine(
            cfg, gcfg, n_slots=b, cache_len=-(-(L + n_new) // 128) * 128,
            max_prefill_group=4, adapters=trainable["adapters"],
            lora_scale=lcfg.scale, emit_stop_token=True,
        )
        reqs = [
            Request(input_ids=ids[i], pixel_values=pb["pixel_values"][i, 0],
                    image_positions=np.asarray(pos[i]))
            for i in range(b)
        ]
        outs = cb.run(params, reqs, rng=jax.random.PRNGKey(2))  # compile
        t0 = time.perf_counter()
        n_out = 0
        for i in range(3):
            outs = cb.run(params, reqs, rng=jax.random.PRNGKey(3 + i))
            n_out += sum(len(o) for o in outs)
        rollout_dt = (time.perf_counter() - t0) / 3
        tokens = np.zeros((b, n_new), np.int32)
        resp_lens = np.zeros((b,), np.int32)
        for i, toks in enumerate(outs):
            tokens[i, : len(toks)] = toks
            resp_lens[i] = len(toks)
        rollout_tok_s = n_out / 3 / rollout_dt
    else:
        gen = Generator(
            cfg,
            GenerateConfig(max_new_tokens=n_new, do_sample=True,
                           temperature=1.0, pad_token_id=0),
            adapters=trainable["adapters"], lora_scale=lcfg.scale,
        )
        tokens = np.asarray(
            gen(params, pb, rng=jax.random.PRNGKey(2))
        )  # compile
        t0 = time.perf_counter()
        for i in range(3):
            tokens = np.asarray(gen(params, pb, rng=jax.random.PRNGKey(3 + i)))
        rollout_dt = (time.perf_counter() - t0) / 3
        rollout_tok_s = b * n_new / rollout_dt
    batch = rollout_to_batch(pb, tokens, 0, resp_lens=resp_lens)
    scores = jnp.linspace(0.0, 1.0, b)
    stats = stats_fn(params, state.trainable, batch, scores, jnp.asarray(0.2))
    jax.block_until_ready(stats.advantages)
    t0 = time.perf_counter()
    for _ in range(3):
        stats = stats_fn(params, state.trainable, batch, scores,
                         jnp.asarray(0.2))
    float(stats.kl)
    stats_dt = (time.perf_counter() - t0) / 3
    from vlrlhf_tpu.train.ppo import _take_rows

    n_mb = b // mb

    def _mb_slice(lo):
        idx = jnp.arange(lo, lo + mb)
        return (
            {k: _take_rows(v, idx, b) for k, v in batch.items()},
            type(stats)(*[_take_rows(f, idx, b) for f in stats]),
        )

    # slices precomputed OUTSIDE the timing loop: eager takes cost ~15 ms/op
    # over the axon tunnel and would contaminate update_dt (the production
    # loop amortizes them against real data loading; here they'd be ~half
    # the measured time). One slice per minibatch, reused across epochs.
    slices = [_mb_slice(m_ * mb) for m_ in range(n_mb)]
    jax.block_until_ready(slices[-1][0]["input_ids"])
    state, m = update_fn(state, params, *slices[0])  # compile
    float(m["ppo/loss/total"])
    t0 = time.perf_counter()
    for i in range(3 * n_mb):
        state, m = update_fn(state, params, *slices[i % n_mb])
    float(m["ppo/loss/total"])
    update_dt = (time.perf_counter() - t0) / (3 * n_mb)

    # ppo_epochs=4 default; each epoch = n_mb minibatch optimizer steps
    e2e = rollout_dt + stats_dt + 4 * n_mb * update_dt
    tok_batch = int(np.prod(batch["input_ids"].shape))
    flops = (
        F.ppo_flops_per_token(cfg, batch["input_ids"].shape[1], ppo_epochs=4)
        * tok_batch
        + F.vision_flops_per_image(cfg.vision) * b
    )
    return {
        "rollout_tok_s": round(rollout_tok_s, 1),
        "rollout_mode": rollout_mode + (
            " (slot-refill, eos modeled as 512-id stop set)"
            if rollout_mode == "cb" else ""
        ),
        "remat_policy": remat,
        "update_remat": update_remat,
        "stats_ms": round(stats_dt * 1e3, 1),
        "update_ms": round(update_dt * 1e3, 1),
        "rollout_ms": round(rollout_dt * 1e3, 1),
        "e2e_steps_per_sec": round(1.0 / e2e, 3),
        "e2e_mfu": round(flops / e2e / _peak_flops(), 4),
        "batch": b, "minibatch": mb, "prompt_len": L, "new_tokens": n_new,
        "ppo_epochs": 4,
        "model": "llava-7b geometry, int8 frozen base + LoRA r64",
    }


def _seg_dpo7():
    """HEADLINE: the 7B north star, bf16 base (the reference's own recipe
    dtype; largest fitting batch = 1 pair). 'attn' remat fits ONLY with
    the chunked lm_head (the (B,S,V) logits + f32 softmax VJP it removes
    are exactly the margin) and beats full remat 1.567 vs 1.539 pairs/s."""
    import dataclasses

    from vlrlhf_tpu.models.registry import FAMILIES

    cfg7 = FAMILIES["llava"].make_config()
    cfg7 = dataclasses.replace(
        cfg7, lm=dataclasses.replace(cfg7.lm, remat_policy="attn")
    )
    pps7, ms7, mfu7, pb7 = _measure_dpo(
        cfg7, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, dpo_kwargs={"logits_chunk": 256},
    )
    return {"pairs_per_sec": round(pps7, 3), "step_ms": round(ms7, 1),
            "mfu": round(mfu7, 4)}


def _seg_qlora7():
    """PERFORMANCE MODE: QLoRA (int8 frozen base, ops/quant.py — the
    reference supports q_lora too, auto_load.py:509-578). Halved param
    HBM affords the 'acts' remat policy (save all per-layer activations)."""
    import dataclasses

    from vlrlhf_tpu.models.registry import FAMILIES

    cfg7q = FAMILIES["llava"].make_config()
    cfg7q = dataclasses.replace(
        cfg7q, lm=dataclasses.replace(cfg7q.lm, remat_policy="acts")
    )
    pps, ms, mfu, _ = _measure_dpo(
        cfg7q, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
    )
    return {"pairs_per_sec": round(pps, 3), "pairs_per_step": 1,
            "step_ms": round(ms, 1), "mfu": round(mfu, 4),
            "ref_logps": "precomputed", "remat_policy": "acts"}


def _seg_qwen():
    """QWEN-VL 7B (9.66B params: 151k vocab + ViT-bigG + resampler) — only
    fits on one v5e with the WIDE int8 set (frozen vision tower +
    projector quantized too, ops/quant.py TRAIN_QUANT_PATTERNS_WIDE)."""
    import dataclasses

    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

    cfgqw = FAMILIES["qwen_vl"].make_config()
    cfgqw = dataclasses.replace(
        cfgqw, lm=dataclasses.replace(cfgqw.lm, remat_policy="mlp1")
    )
    qw = _measure_dpo(
        cfgqw, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
        quant_patterns=TRAIN_QUANT_PATTERNS_WIDE,
    )
    return {"pairs_per_sec": round(qw[0], 3), "pairs_per_step": 1,
            "step_ms": round(qw[1], 1), "mfu": round(qw[2], 4),
            "params_b": round(qw[3], 2), "ref_logps": "precomputed",
            "remat_policy": "mlp1", "quant": "int8 lm+vision+projector"}


def _seg_xc2():
    """XC2 7B (8.06B: InternLM2 GQA + PLoRA + 490px tower, 1225 image
    tokens => seq 2048 to hold a real row) — wide int8, 'attn' remat."""
    import dataclasses

    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.ops.quant import TRAIN_QUANT_PATTERNS_WIDE

    cfgxc = FAMILIES["internlm_xc2"].make_config()
    cfgxc = dataclasses.replace(
        cfgxc, lm=dataclasses.replace(cfgxc.lm, remat_policy="attn")
    )
    xc = _measure_dpo(
        cfgxc, n_pairs=1, seq=2048, n_steps=10, n_warmup=3,
        precompute_ref=True, quantize=True,
        quant_patterns=TRAIN_QUANT_PATTERNS_WIDE, with_plora=True,
    )
    return {"pairs_per_sec": round(xc[0], 3), "pairs_per_step": 1,
            "seq": 2048, "step_ms": round(xc[1], 1),
            "mfu": round(xc[2], 4), "params_b": round(xc[3], 2),
            "ref_logps": "precomputed", "remat_policy": "attn",
            "quant": "int8 lm+vision+projector"}


def _seg_c15():
    """Continuity: round-1 1.5B shape, online ref ('acts' fits in bf16)."""
    import dataclasses

    import __graft_entry__ as graft

    cfg15 = graft._flagship_config(tiny=False)
    cfg15 = dataclasses.replace(
        cfg15, lm=dataclasses.replace(cfg15.lm, remat_policy="acts")
    )
    c15 = _measure_dpo(
        cfg15, n_pairs=4, seq=1024, n_steps=10, n_warmup=3,
        precompute_ref=False,
    )
    return {"pairs_per_sec": round(c15[0], 3), "pairs_per_step": 4,
            "step_ms": round(c15[1], 1), "mfu": round(c15[2], 4),
            "ref_logps": "online", "remat_policy": "acts"}


def _seg_int4():
    """int4 at 7B ON CHIP in a driver-capturable artifact (VERDICT r3
    next-item 3: the r3 sweep's int4 records were failures and the
    post-fix evidence was builder prose at 1.5B).

    (a) QLoRA --bits 4 training step (reference parity: GPTQ q_lora
        bits=4, auto_load.py:527-531) — Pallas dequant-matmul fwd +
        transpose-kernel VJP in the hot path;
    (b) serving decode ms/token int4 vs int8 at B=8 — expected int4
        SLOWER per token (VPU nibble-unpack outweighs halved HBM reads at
        decode batch; the int4 win is capacity: 7B weights in ~3.5 GiB).
    """
    import dataclasses

    import numpy as np

    from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    out = {"model": "llava-7b geometry"}

    # ---- (a) int4 QLoRA DPO step ----
    cfg = FAMILIES["llava"].make_config()
    for remat in ("acts", "attn"):  # acts first; fall back if compile-OOM
        cfgq = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, remat_policy=remat)
        )
        try:
            pps, ms, mfu, _ = _measure_dpo(
                cfgq, n_pairs=1, seq=1024, n_steps=10, n_warmup=3,
                precompute_ref=True, quantize=True, bits=4,
                dpo_kwargs={"logits_chunk": 256},
            )
            out["qlora_int4"] = {
                "pairs_per_sec": round(pps, 3), "step_ms": round(ms, 1),
                "mfu": round(mfu, 4), "remat_policy": remat, "bits": 4,
            }
            break
        except Exception as e:  # compile-OOM at this policy: try the next
            out["qlora_int4"] = {"error": f"{remat}: {e}"[:300]}

    # ---- (b) int4 vs int8 decode ----
    def _decode_ms(bits):
        params = jax.jit(
            lambda k: quantize_params(init_vlm_params(cfg, k), bits=bits)
        )(jax.random.PRNGKey(0))
        B, prompt, n_new = 8, 128, 32
        ids = np.random.default_rng(1).integers(5, 1000, (B, prompt))
        batch = {
            "input_ids": ids.astype(np.int32),
            "pad_mask": np.ones((B, prompt), bool),
            "prompt_lens": np.full((B,), prompt, np.int32),
            "pixel_values": None, "image_positions": None,
        }
        gen = Generator(cfg, GenerateConfig(
            max_new_tokens=n_new, pad_token_id=0, decode_mode="device",
            kv_cache_dtype="int8",
        ))
        t = gen(params, batch)
        _ = int(jnp.sum(t))
        t0 = time.perf_counter()
        for _ in range(3):
            t = gen(params, batch)
        _ = int(jnp.sum(t))
        del params
        return (time.perf_counter() - t0) / 3 / n_new * 1e3

    try:
        ms4 = _decode_ms(4)
        out["decode_int4_ms_per_tok"] = round(ms4, 2)
        out["decode_int4_tok_s"] = round(8 / ms4 * 1e3, 0)
    except Exception as e:
        out["decode_int4_ms_per_tok"] = f"error: {e}"[:300]
    try:
        ms8 = _decode_ms(8)
        out["decode_int8_ms_per_tok"] = round(ms8, 2)
    except Exception as e:
        out["decode_int8_ms_per_tok"] = f"error: {e}"[:300]
    out["note"] = (
        "int4 decode is expected slower per-token than int8 on TPU (VPU "
        "nibble unpack); the int4 win is HBM capacity (QLoRA fit, "
        "co-residency), measured honestly here at 7B"
    )
    return out


def _measure_spec(n_requests=24, n_slots=8, k=3, seed=0):
    """End-to-end speculative decoding through the PRODUCTION serving path
    (VERDICT r3 missing #1 / next-item 1b: only per-dispatch verify costs
    were ever measured). Same CB engine, same workload, speculative_k=0 vs
    K — wall-clock A/B on chip, both honesty bounds:

      greedy: random-init weights greedy-decode into repetitive
        continuations that prompt-lookup bigram drafts predict well — the
        ECHO-HEAVY end of real workloads (OCR/quote-style VQA answers).
        On-chip token parity vs k=0 is reported QUANTIFIED, not asserted:
        the verify-chunk and one-token-decode programs are different XLA
        programs, and at random-init logit margins a few positions per
        long response flip on a single bf16 ulp (tools/spec_parity_probe
        on chip: 18/24 requests bit-identical, every divergence top-2
        teacher-forced with margin 1-2 ulp, both engines deterministic —
        numerics, not scheduling). CPU f32 parity is pinned bit-exact by
        tests/test_continuous_spec.py.
      sampled t=1.0: drafts almost never accepted — the ADVERSARIAL end;
        measured both with the production acceptance gate
        (speculative_adaptive, flips to plain bursts when spec loses) and
        raw (gate off: the honest all-miss verify tax).

    Real VQA acceptance sits between the bounds. Full sweep incl. K=7:
    tools/spec_e2e.py.

    DEFAULT IS THE BUDGET-SIZED SHAPE (VERDICT r4 next-item 1c): 12
    requests, greedy echo bound only, single pass — the adversarial sampled
    bound (0.94-0.96x gated / 0.68x raw at r4's 24-request shape) is cited
    from tools/r4_sweep_results.log [r4 spec_seg]. SPEC_FULL=1 restores the
    full 24-request both-bounds min-of-2 r4 segment."""
    import os

    import numpy as np

    full = bool(int(os.environ.get("SPEC_FULL", "0")))
    if not full:
        n_requests = 12
    best_of = 2 if full else 1

    from vlrlhf_tpu.generate.continuous import ContinuousEngine, Request
    from vlrlhf_tpu.generate.engine import GenerateConfig
    from vlrlhf_tpu.models.registry import FAMILIES
    from vlrlhf_tpu.models.vlm import init_vlm_params
    from vlrlhf_tpu.ops.quant import quantize_params

    cfg = FAMILIES["llava"].make_config()
    params = jax.jit(
        lambda kk: quantize_params(init_vlm_params(cfg, kk))
    )(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    n_img = cfg.num_image_tokens
    L = n_img + 32
    img = cfg.vision.image_size
    stops = rng.integers(16, 257, n_requests)
    pos = np.arange(2, 2 + n_img, dtype=np.int32)
    pixels = rng.integers(0, 255, (img, img, 3)).astype(np.float32) / 255.0
    reqs = []
    for i in range(n_requests):
        ids = rng.integers(5, 30000, (L,)).astype(np.int32)
        ids[pos] = cfg.image_token_id
        reqs.append(Request(input_ids=ids, pixel_values=pixels,
                            image_positions=pos,
                            max_new_tokens=int(stops[i])))

    def _run(spec_k, sample, adaptive=True):
        eng = ContinuousEngine(
            cfg,
            GenerateConfig(max_new_tokens=256, pad_token_id=0,
                           kv_cache_dtype="int8", do_sample=sample,
                           temperature=1.0 if sample else 0.0),
            n_slots=n_slots, cache_len=1024, prefill_chunk=128,
            max_prefill_group=4, speculative_k=spec_k,
            speculative_adaptive=adaptive,
        )
        eng.warmup(params, reqs[0])
        dt = float("inf")  # min-of-N (same estimator as the serving seg)
        for _ in range(best_of):
            t0 = time.perf_counter()
            out = eng.run(params, reqs,
                          rng=jax.random.PRNGKey(7) if sample else None)
            dt = min(dt, time.perf_counter() - t0)
        frac = (
            round(eng.last_spec_bursts / max(eng.last_bursts, 1), 3)
            if spec_k else None
        )
        del eng
        return n_requests / dt, out, frac

    g0, tok0, _ = _run(0, False)
    gk, tokk, g_frac = _run(k, False)
    if full:
        s0, _, _ = _run(0, True)
        sk_ad, _, ad_frac = _run(k, True)
        sk_raw, _, _ = _run(k, True, adaptive=False)
        adversarial = {
            "sampled_t1_adversarial_gated": round(sk_ad / s0, 3),
            "sampled_t1_adversarial_raw": round(sk_raw / s0, 3),
            "sampled_imgs_per_sec": {
                "k0": round(s0, 3), "k_gated": round(sk_ad, 3),
                "k_raw": round(sk_raw, 3)},
            "sampled_gated_burst_fraction": ad_frac,
        }
    else:
        adversarial = {
            "sampled_t1_adversarial": (
                "not re-measured (budget): r4 on-chip record at 24 reqs = "
                "0.96x gated / 0.68x raw — tools/r4_sweep_results.log "
                "[r4 spec_seg]; SPEC_FULL=1 re-measures"
            ),
        }
    n_same = sum(a == b for a, b in zip(tok0, tokk))
    return {
        "speculative_k": k,
        "greedy_speedup_echo_bound": round(gk / g0, 3),
        **adversarial,
        "greedy_identical": f"{n_same}/{n_requests}",
        "greedy_divergence": (
            "single-bf16-ulp argmax tie-flips between the verify-chunk and "
            "decode programs (tools/spec_parity_probe.py on chip: every "
            "diverging token ranks top-2 teacher-forced, margin 1-2 ulp; "
            "both engines deterministic; CPU f32 parity bit-exact)"
        ),
        "spec_burst_fraction": {"greedy": g_frac},
        "imgs_per_sec": {"greedy_k0": round(g0, 3), "greedy_k": round(gk, 3)},
        "n_requests": n_requests, "n_slots": n_slots, "prompt_len": L,
        "output_lens": "uniform(16,256)", "cb_best_of": best_of,
        "note": ("real-workload acceptance sits between the echo and "
                 "adversarial bounds; drafting is prompt-lookup bigram "
                 "(device-resident), verify rides the chunk-attention "
                 "path; the gate re-probes the idle mode with exponential "
                 "backoff (base 16 bursts)"),
        "model": "llava-7b geometry, int8 weights + int8 KV, CB engine",
    }


SEGMENTS = {
    "dpo7": _seg_dpo7,
    "qlora7": _seg_qlora7,
    "qwen": _seg_qwen,
    "xc2": _seg_xc2,
    "c15": _seg_c15,
    "eval": _measure_eval_7b,
    "eval15": _measure_eval_15b,
    "serving": _measure_serving_cb,
    "ppo": _measure_ppo_7b,
    "int4": _seg_int4,
    "spec": _measure_spec,
}

# Expected per-segment wall seconds ON THIS CHIP (measured r4/r5, cold-ish
# compile cache). The budget scheduler skips a segment when the remaining
# budget can't plausibly cover it, and bounds each subprocess so one hung
# segment can never eat the whole artifact (the r4 failure mode: BENCH_r04
# was rc=124/parsed=null because 10 unbounded sequential segments printed
# nothing until the very end — VERDICT r4 missing #1).
SEG_EST_S = {
    # r5 full-run measurements (warm persistent compile cache — the state a
    # driver run on this box sees) + ~15% margin; the 1.8x subprocess
    # timeout covers a cold-cache compile.
    "serving": 430.0,   # measured 288s r5 full run single-pass; +CB pass
    "dpo7": 310.0,      # 269s
    "qlora7": 230.0,    # 199s
    "eval": 220.0,      # 191s (7B MME-shaped only; 1.5B rider in eval15)
    "ppo": 285.0,       # 246s
    "int4": 235.0,      # 201s warm (cold r4: 400s — timeout covers it)
    "spec": 440.0,      # 380s greedy bound single-pass (r4 full was 741s)
    "c15": 85.0,        # 71s
    "qwen": 95.0,       # 78s
    "xc2": 345.0,       # 299s
    "eval15": 85.0,     # 71s isolated
}

# Canonical order: the 7 blocks VERDICT r4 names as "done" first (serving
# leads — the CB comparison is calibrated in the standalone condition, see
# the r4 cb_variance history), optional continuity/family segments last so
# a budget squeeze drops the least-load-bearing evidence.
SEG_ORDER = ("serving", "dpo7", "qlora7", "eval", "ppo", "int4", "spec",
             "c15", "qwen", "xc2", "eval15")


def _run_seg(name: str, timeout: float = 1800.0) -> dict:
    """Run one bench segment in a FRESH subprocess and parse its JSON line.

    Isolation is load-bearing twice over: (a) HBM/host state left by an
    earlier segment measurably skews later ones (the serving CB segment
    measured 0.938x inside a shared bench process vs 1.27x standalone —
    same commit, same chip), and (b) a compile-helper OOM in one segment
    (seen at 7B PPO and family sweeps) must not kill the whole artifact —
    the driver writes BENCH_rNN.json from ONE `python bench.py` run."""
    import os
    import subprocess
    import sys as _sys

    here = os.path.dirname(os.path.abspath(__file__))
    last_err = None
    for attempt in range(2):
        try:
            p = subprocess.run(
                [_sys.executable, os.path.join(here, "bench.py"),
                 "--seg", name],
                capture_output=True, text=True, timeout=timeout, cwd=here,
            )
        except subprocess.TimeoutExpired:
            return {"error": f"segment {name} timed out after {timeout:.0f}s"}
        for line in reversed((p.stdout or "").strip().splitlines()):
            try:
                return json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
        tail = (p.stderr or "")[-300:].replace("\n", " | ")
        last_err = {"error": f"segment {name}: rc={p.returncode} "
                             f"stderr: {tail}"}
        # the axon tunnel frees a just-exited client's HBM lazily; the
        # NEXT segment's first big alloc can transiently RESOURCE_EXHAUST
        # (observed r4: the same segment passed clean seconds later).
        # One delayed retry only for that signature.
        if "RESOURCE_EXHAUSTED" not in (p.stderr or ""):
            break
        last_err["note"] = "transient RESOURCE_EXHAUSTED; retried once"
        import time as _time

        _time.sleep(20)
    return last_err


# Output-JSON key for each segment (kept from the r2-r4 artifact schema so
# rounds stay comparable).
SEG_KEY = {
    "serving": "serving_cb",
    "qlora7": "qlora_int8_7b",
    "qwen": "qlora_int8_qwenvl_7b",
    "xc2": "qlora_int8_xc2_7b",
    "c15": "continuity_1p5b",
    "eval": "eval",
    "eval15": "eval_continuity_1p5b",
    "ppo": "ppo",
    "int4": "int4_7b",
    "spec": "speculative",
}


def _summary(blocks, skipped, pending, elapsed, budget):
    """The canonical artifact line, buildable at ANY point mid-run."""
    head = blocks.get("dpo7") or {}
    out = {
        "metric": "dpo_pairs_per_sec_per_chip",
        "value": head.get("pairs_per_sec", 0.0),
        "unit": "pairs/s",
        # the reference publishes no throughput numbers
        # (BASELINE.json.published == {}), so there is no real baseline ratio
        "vs_baseline": 0.0,
        "model": "llava-1.5-7b geometry (7.06B params, bf16)",
        "pairs_per_step": 1,
        "seq": 1024,
        "step_ms": head.get("step_ms"),
        "mfu": head.get("mfu"),
        "mfu_vs_40pct_target": round((head.get("mfu") or 0.0) / 0.40, 3),
        "ref_logps": "precomputed",
        "remat_policy": "attn",
        "logits_chunk": 256,
        "flops_accounting": "LoRA 4N fwd+bwd (frozen base: no dW matmuls)",
    }
    for name in SEG_ORDER:
        if name in blocks and name != "dpo7":
            out[SEG_KEY[name]] = blocks[name]
    out["skipped"] = skipped
    if pending:
        out["pending"] = list(pending)
    out["bench_elapsed_s"] = round(elapsed, 1)
    out["bench_budget_s"] = budget
    out["backend"] = jax.default_backend()
    return out


def main():
    """Streaming, budgeted bench (VERDICT r4 missing #1: BENCH_r04 was
    rc=124/parsed=null because 10 unbounded segments printed one line at the
    very end — ~60-80 min total vs the driver's budget).

    Every segment now (a) runs in its own bounded subprocess, (b) prints a
    segment-tagged JSON line the moment it completes, and (c) is followed by
    a cumulative summary line — so whenever the driver kills the process,
    the LAST parseable stdout line is a full summary of everything measured
    so far. Segments the budget can't cover are skipped explicitly
    (`"skipped": [...]`), never silently. Budget knob: BENCH_BUDGET_S
    (default 2340 s ~= 39 min, sized under an assumed ~40-min driver cap)."""
    import os

    _compile_cache()
    on_tpu = jax.default_backend() == "tpu"

    if not on_tpu:
        import __graft_entry__ as graft

        cfg = graft._flagship_config(tiny=True)
        pps, ms, mfu, pb = _measure_dpo(cfg, 2, 64, 3, 1, False)
        print(json.dumps({
            "metric": "dpo_pairs_per_sec_per_chip", "value": round(pps, 3),
            "unit": "pairs/s", "vs_baseline": 0.0, "backend": "cpu",
            "model": "tiny-cpu",
        }))
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "2340"))
    start = time.perf_counter()
    blocks: dict = {}
    skipped: list = []
    # SERVING RUNS FIRST: axon frees a dead subprocess's HBM lazily and the
    # CB engine's host loop is wakeup-sensitive on 1-CPU hosts — run right
    # after the 7B eval segment the CB comparison repeatedly drew ~1.24x vs
    # 1.33-1.35x standalone (r3 driver artifact hit the same draw; history
    # in tools/r4_sweep_results.log [r4 cb_variance]). First slot = the
    # standalone condition the measurement is calibrated in.
    for i, name in enumerate(SEG_ORDER):
        est = SEG_EST_S[name]
        remaining = budget - (time.perf_counter() - start)
        if remaining < 0.8 * est:
            skipped.append({
                "segment": name,
                "reason": f"budget: {remaining:.0f}s left < "
                          f"~{est:.0f}s expected",
            })
            continue
        t0 = time.perf_counter()
        res = _run_seg(name, timeout=min(1.8 * est, remaining))
        seg_s = time.perf_counter() - t0
        blocks[name] = res
        print(json.dumps({"segment": name, "seg_elapsed_s": round(seg_s, 1),
                          **res}), flush=True)
        pending = SEG_ORDER[i + 1:]
        print(json.dumps(_summary(
            blocks, skipped, pending, time.perf_counter() - start, budget,
        )), flush=True)
    # final (pending empty) — the canonical last line
    print(json.dumps(_summary(
        blocks, skipped, (), time.perf_counter() - start, budget,
    )), flush=True)


def main_eval():
    """Secondary north-star metric standalone: eval images/sec through the
    generation engine (MME-style batched greedy decode) + the
    continuous-batching serving comparison. Run: python bench.py --eval
    (both blocks are ALSO part of the default `python bench.py` output)."""
    _compile_cache()
    if jax.default_backend() != "tpu":
        print(json.dumps({
            "metric": "eval_imgs_per_sec", "value": 0.0, "unit": "imgs/s",
            "vs_baseline": 0.0, "backend": jax.default_backend(),
            "note": "TPU-only bench",
        }))
        return
    # serving first — see main(): running it after the 7B eval segment
    # repeatedly drew ~1.24x vs 1.33-1.35x standalone (axon lazy HBM free)
    serving = _run_seg("serving")
    print(json.dumps({"segment": "serving", **serving}), flush=True)
    block = _run_seg("eval")
    print(json.dumps({
        "metric": "eval_imgs_per_sec",
        "value": block.get("imgs_per_sec", 0.0),
        "unit": "imgs/s",
        "vs_baseline": 0.0,
        **{k: v for k, v in block.items() if k != "imgs_per_sec"},
        "serving_cb": serving,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    import sys

    if "--seg" in sys.argv:
        # single-segment subprocess mode (see _run_seg)
        _compile_cache()
        name = sys.argv[sys.argv.index("--seg") + 1]
        print(json.dumps(SEGMENTS[name]()))
    elif "--eval" in sys.argv:
        main_eval()
    else:
        main()
