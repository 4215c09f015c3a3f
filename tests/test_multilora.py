"""Multi-adapter serving (one base, N LoRA sets, per-request selection —
the S-LoRA/punica role the reference has no analog of).

The whole contract: a batch mixing adapter indices must produce EXACTLY
the tokens each row would get from a single-adapter engine running its
own set."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_continuous import _requests
from tests.test_dpo_step import tiny_vlm_config
from vlrlhf_tpu.generate.continuous import ContinuousEngine
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora, stack_adapter_sets
from vlrlhf_tpu.models.vlm import init_vlm_params


def _sets(params, n=2):
    lcfg = LoraConfig(r=4, alpha=8, dropout=0.0,
                      target_patterns=(r"attn/(wq|wv)", r"mlp/gate"))
    sets = []
    for i in range(n):
        ad = init_lora(params, lcfg, jax.random.PRNGKey(10 + i))
        # randomize b so each set's delta is nonzero AND distinct
        ad = jax.tree.map(
            lambda a, i=i: a + 0.05 * jax.random.normal(
                jax.random.PRNGKey(100 + i), a.shape, a.dtype
            ),
            ad,
        )
        sets.append(ad)
    return sets, lcfg


def test_stack_adapter_sets_axes():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    sets, _ = _sets(params)
    stacked = stack_adapter_sets(sets)

    def check(path, leaf, s0):
        # inner-axis stacking (see stack_adapter_sets): 'a' leaves gain an
        # N axis before r; 'b' leaves fold N into the contraction axis —
        # the mixed delta is then two dense matmuls at width N*r
        n = 2
        if "layers_scanned" in path:
            if path.endswith("/a"):
                want = (s0.shape[0], s0.shape[1], n, s0.shape[2])
            else:
                want = (s0.shape[0], n * s0.shape[1], s0.shape[2])
        else:
            if path.endswith("/a"):
                want = (s0.shape[0], n, s0.shape[1])
            else:
                want = (n * s0.shape[0], s0.shape[1])
        assert leaf.shape == want, (path, leaf.shape, want)

    from vlrlhf_tpu.core.partitioning import tree_paths

    flat_s = dict(tree_paths(stacked))
    for path, s0 in tree_paths(sets[0]):
        check(path, flat_s[path], s0)


def test_static_engine_multilora_matches_per_adapter():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    sets, lcfg = _sets(params)
    gcfg = GenerateConfig(max_new_tokens=8, pad_token_id=0)
    from tests.test_speculative import _batch

    batch = _batch([20, 24, 22, 26], 32, seed=7)
    idx = np.asarray([0, 1, 1, 0])

    want = np.zeros((4, 8), np.int32)
    for j in range(2):
        single = Generator(cfg, gcfg, adapters=sets[j],
                           lora_scale=lcfg.scale)
        out = np.asarray(single(params, batch))
        want[idx == j] = out[idx == j]

    mix = np.zeros((4, 2), np.float32)
    mix[np.arange(4), idx] = 1.0
    multi = Generator(
        cfg, gcfg,
        adapters=dict(stack_adapter_sets(sets), __mix__=mix),
        lora_scale=lcfg.scale,
    )
    got = np.asarray(multi(params, batch))
    np.testing.assert_array_equal(got, want)
    # and the two sets genuinely disagree somewhere (the test has teeth)
    single0 = np.asarray(
        Generator(cfg, gcfg, adapters=sets[0], lora_scale=lcfg.scale)(
            params, batch
        )
    )
    single1 = np.asarray(
        Generator(cfg, gcfg, adapters=sets[1], lora_scale=lcfg.scale)(
            params, batch
        )
    )
    assert (single0 != single1).any()


def test_http_adapter_selection(tmp_path):
    """The daemon's {"adapter": name} routing: same question served under
    two registered sets gives each set's own tokens; unknown names 400."""
    import argparse
    import json
    import threading
    import urllib.request
    import urllib.error

    from vlrlhf_tpu.cli.main import _synthetic_bundle
    from vlrlhf_tpu.data.collators import CollatorConfig
    from vlrlhf_tpu.generate.server import (
        EngineServer,
        RequestBuilder,
        serve_http,
    )

    args = argparse.Namespace(
        model_family="llava", max_length=64, max_prompt_length=48,
        synthetic=2,
    )
    family, cfg, params, processor = _synthetic_bundle(args)
    sets, lcfg = _sets(params)
    gen_cfg = GenerateConfig(
        max_new_tokens=6, pad_token_id=processor.tokenizer.pad_token_id or 0,
    )
    engine = ContinuousEngine(
        cfg, gen_cfg, n_slots=2, cache_len=128,
        adapter_sets=sets, lora_scale=lcfg.scale,
    )
    srv = EngineServer(engine, params).start()
    ccfg = CollatorConfig(
        pad_token_id=processor.tokenizer.pad_token_id or 0,
        bucket_multiple=32, image_size=cfg.vision.image_size,
        resize_mode=family.resize_mode,
    )
    builder = RequestBuilder(
        processor, ccfg, lambda p, s, m: np.zeros((s, s, 3), np.uint8)
    )
    httpd = serve_http(
        srv, builder, processor.tokenizer, port=0,
        adapter_names=["math", "code"],
    )
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        return json.loads(urllib.request.urlopen(req, timeout=240).read())

    try:
        q = {"question": "what is in the image?", "image": "x.jpg"}
        t_math = post(dict(q, adapter="math"))["text"]
        t_code = post(dict(q, adapter="code"))["text"]
        want = []
        for j in range(2):
            toks = ContinuousEngine(
                cfg, gen_cfg, n_slots=2, cache_len=128,
                adapters=sets[j], lora_scale=lcfg.scale,
            ).run(params, [builder.build(q["question"], "x.jpg")])[0]
            want.append(processor.tokenizer.decode(
                list(toks), skip_special_tokens=True
            ).strip())
        assert (t_math, t_code) == tuple(want), ((t_math, t_code), want)
        try:
            post(dict(q, adapter="nope"))
            raise AssertionError("unknown adapter should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_continuous_engine_multilora_matches_per_adapter():
    """Slot-refill serving with per-request adapter selection: 2 slots, 5
    requests alternating adapters — every response equals the single-
    adapter static engine's greedy output for that request."""
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    sets, lcfg = _sets(params)
    reqs = _requests(n=5)
    for i, r in enumerate(reqs):
        reqs[i] = dataclasses.replace(r, adapter_idx=i % 2)

    gcfg = GenerateConfig(max_new_tokens=10, pad_token_id=-1)
    want = []
    for i, r in enumerate(reqs):
        gen = Generator(cfg, gcfg, adapters=sets[i % 2],
                        lora_scale=lcfg.scale)
        L = len(r.input_ids)
        batch = {
            "input_ids": r.input_ids[None],
            "pad_mask": np.ones((1, L), bool),
            "prompt_lens": np.asarray([L], np.int32),
            "pixel_values": r.pixel_values[None, None],
            "image_positions": r.image_positions[None],
        }
        toks = np.asarray(gen(params, batch))[0]
        keep = []
        for t in toks:
            if t == -1:
                break
            keep.append(int(t))
        want.append(keep[: r.max_new_tokens])

    eng = ContinuousEngine(
        cfg, gcfg, n_slots=2, cache_len=64, prefill_chunk=8,
        adapter_sets=sets, lora_scale=lcfg.scale,
    )
    got = eng.run(params, reqs)
    for g, w, r in zip(got, want, reqs):
        assert g == w, (r.adapter_idx, g, w)


def test_continuous_engine_multilora_fused_params_parity():
    """FUSED serving layout end to end: base params through fuse_vlm_params
    (wqkv/gateup) AND full-target adapter sets auto-fused by the engine
    (lora.fuse_adapter_sets — one A-concat + one block-diagonal-B delta per
    fusion group) must reproduce the unfused single-adapter static engine's
    greedy tokens per request. Partial-target sets keep the per-name path
    (covered by test_continuous_engine_multilora_matches_per_adapter)."""
    from vlrlhf_tpu.models.lm.fuse import fuse_vlm_params

    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    lcfg = LoraConfig(
        r=4, alpha=8, dropout=0.0,
        target_patterns=(r"attn/(wq|wk|wv)", r"mlp/(gate|up)"),
    )
    sets = []
    for i in range(2):
        ad = init_lora(params, lcfg, jax.random.PRNGKey(10 + i))
        ad = jax.tree.map(
            lambda a, i=i: a + 0.05 * jax.random.normal(
                jax.random.PRNGKey(100 + i), a.shape, a.dtype
            ),
            ad,
        )
        sets.append(ad)
    reqs = _requests(n=5)
    for i, r in enumerate(reqs):
        reqs[i] = dataclasses.replace(r, adapter_idx=i % 2)

    gcfg = GenerateConfig(max_new_tokens=10, pad_token_id=-1)
    want = []
    for i, r in enumerate(reqs):
        gen = Generator(cfg, gcfg, adapters=sets[i % 2],
                        lora_scale=lcfg.scale)
        L = len(r.input_ids)
        batch = {
            "input_ids": r.input_ids[None],
            "pad_mask": np.ones((1, L), bool),
            "prompt_lens": np.asarray([L], np.int32),
            "pixel_values": r.pixel_values[None, None],
            "image_positions": r.image_positions[None],
        }
        toks = np.asarray(gen(params, batch))[0]
        keep = []
        for t in toks:
            if t == -1:
                break
            keep.append(int(t))
        want.append(keep[: r.max_new_tokens])

    fused = fuse_vlm_params(params)
    eng = ContinuousEngine(
        cfg, gcfg, n_slots=2, cache_len=64, prefill_chunk=8,
        adapter_sets=sets, lora_scale=lcfg.scale,
    )
    got = eng.run(fused, reqs)
    for g, w, r in zip(got, want, reqs):
        assert g == w, (r.adapter_idx, g, w)
    # the engine actually took the fused-adapter path
    assert eng._fused_adapters, "fused adapter tree was never built"
    fa = next(iter(eng._fused_adapters.values()))
    layers = fa["lm"]["layers_scanned"]
    assert "wqkv" in layers["attn"] and "gateup" in layers["mlp"]
