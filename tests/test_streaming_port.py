"""Streaming HF checkpoint port (VERDICT r2 missing item 3): LazyStateDict
reads one tensor at a time from sharded safetensors, port_dtype casts before
device transfer, and the pop-based layer stacker frees per-layer buffers —
bounded host memory at 7B+ instead of 3x model bytes."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.utils import hf_port


def _llama_sd(vocab=256, hidden=32, inter=64, n_layers=2, seed=0):
    """Synthetic HF-llama state dict (float32 numpy)."""
    rng = np.random.default_rng(seed)
    sd = {"model.embed_tokens.weight": rng.normal(size=(vocab, hidden)),
          "model.norm.weight": rng.normal(size=(hidden,)),
          "lm_head.weight": rng.normal(size=(vocab, hidden))}
    for i in range(n_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = rng.normal(size=(hidden,))
        sd[f"{p}.post_attention_layernorm.weight"] = rng.normal(size=(hidden,))
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = rng.normal(
                size=(hidden, hidden)
            )
        for proj, shape in (("gate_proj", (inter, hidden)),
                            ("up_proj", (inter, hidden)),
                            ("down_proj", (hidden, inter))):
            sd[f"{p}.mlp.{proj}.weight"] = rng.normal(size=shape)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _write_shards(sd, out_dir, n_shards=3):
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    keys = sorted(sd)
    per = -(-len(keys) // n_shards)
    for s in range(n_shards):
        chunk = {k: sd[k] for k in keys[s * per : (s + 1) * per]}
        if chunk:
            save_file(
                chunk,
                os.path.join(
                    out_dir, f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
                ),
            )


def test_lazy_state_dict_matches_eager(tmp_path):
    sd = _llama_sd()
    _write_shards(sd, tmp_path)
    lazy = hf_port.open_hf_state_dict(str(tmp_path))
    eager = hf_port.load_hf_state_dict(str(tmp_path))
    assert set(lazy) == set(eager) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(lazy[k]), eager[k])

    got = hf_port.port_llama_lm(lazy, 2)
    want = hf_port.port_llama_lm(sd, 2)
    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, want,
    )


def test_port_dtype_casts_before_device(tmp_path):
    sd = _llama_sd()
    _write_shards(sd, tmp_path)
    lazy = hf_port.open_hf_state_dict(str(tmp_path))
    with hf_port.port_dtype(jnp.bfloat16):
        got = hf_port.port_llama_lm(lazy, 2)
    want = hf_port.cast_tree(hf_port.port_llama_lm(sd, 2), jnp.bfloat16)
    import jax

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_lazy_reads_are_per_tensor(tmp_path):
    """No shard is eagerly materialized: index exists before any read, and a
    single __getitem__ touches one tensor."""
    sd = _llama_sd()
    _write_shards(sd, tmp_path)
    lazy = hf_port.open_hf_state_dict(str(tmp_path))
    assert len(lazy) == len(sd)
    one = lazy["model.norm.weight"]
    np.testing.assert_array_equal(one, sd["model.norm.weight"])


def test_quantize_during_port_matches_post_quantize(tmp_path):
    """port_quantize (host per-layer int8 before transfer) must produce the
    same tree as port-then-quantize_params on device: identical structure,
    bitwise-equal bf16 scales (amax/127 is deterministic), and int8 codes
    equal up to ±1 on exact round-half ties — XLA may rewrite kf/scale as
    kf*(1/scale), a 1-ulp quotient difference that flips banker's rounding
    on values landing exactly on .5. A ±1 code is a ≤1-scale-step weight
    difference, within int8 quantization error by construction.
    This is the load path that fits a 7B judge next to a resident eval model
    (cli/loading.py load_model_bundle quantize_patterns)."""
    import jax

    from vlrlhf_tpu.ops.quant import DEFAULT_QUANT_PATTERNS, quantize_params

    sd = _llama_sd()
    _write_shards(sd, tmp_path)
    lazy = hf_port.open_hf_state_dict(str(tmp_path))

    with hf_port.port_dtype(jnp.bfloat16), hf_port.port_quantize(
        DEFAULT_QUANT_PATTERNS
    ):
        streamed = {"lm": hf_port.port_llama_lm(lazy, 2)}
    # the loader's post-pass picks up non-stacked matches (lm_head)
    streamed = jax.jit(
        lambda p: quantize_params(p, DEFAULT_QUANT_PATTERNS)
    )(streamed)

    with hf_port.port_dtype(jnp.bfloat16):
        dense = {"lm": hf_port.port_llama_lm(sd, 2)}
    want = jax.jit(
        lambda p: quantize_params(p, DEFAULT_QUANT_PATTERNS)
    )(dense)

    assert jax.tree.structure(streamed) == jax.tree.structure(want)
    stack = streamed["lm"]["layers_scanned"]
    assert stack["attn"]["wq"]["kernel_q"].dtype == jnp.int8
    assert streamed["lm"]["lm_head"]["kernel_q"].dtype == jnp.int8
    sl, wl = jax.tree.leaves(streamed), jax.tree.leaves(want)
    for a, b in zip(sl, wl):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        if getattr(a, "dtype", None) == jnp.int8:
            diff = np.abs(af - bf)
            assert diff.max() <= 1, diff.max()
            # ties are rare: well under 1% of codes may straddle .5
            assert (diff > 0).mean() < 0.01, (diff > 0).mean()
        else:
            np.testing.assert_array_equal(af, bf)


def test_quantize_during_port_int4_matches_post_quantize(tmp_path):
    """port_quantize(bits=4): host split-half nibble packing during the
    stream must match port-then-quantize_params(bits=4) on device — same
    tree structure, bitwise-equal bf16 group scales, packed codes equal up
    to the same ±1 round-half-tie wobble as int8 (a ±1 nibble shows as ±1
    or ±16 in the packed byte, so compare UNPACKED codes)."""
    import jax

    from vlrlhf_tpu.ops.int4 import unpack_int4
    from vlrlhf_tpu.ops.quant import DEFAULT_QUANT_PATTERNS, quantize_params

    sd = _llama_sd(hidden=128, inter=256)
    _write_shards(sd, tmp_path)
    lazy = hf_port.open_hf_state_dict(str(tmp_path))

    with hf_port.port_dtype(jnp.bfloat16), hf_port.port_quantize(
        DEFAULT_QUANT_PATTERNS, bits=4
    ):
        streamed = {"lm": hf_port.port_llama_lm(lazy, 2)}
    streamed = jax.jit(
        lambda p: quantize_params(p, DEFAULT_QUANT_PATTERNS, bits=4)
    )(streamed)

    with hf_port.port_dtype(jnp.bfloat16):
        dense = {"lm": hf_port.port_llama_lm(sd, 2)}
    want = jax.jit(
        lambda p: quantize_params(p, DEFAULT_QUANT_PATTERNS, bits=4)
    )(dense)

    assert jax.tree.structure(streamed) == jax.tree.structure(want)
    stack = streamed["lm"]["layers_scanned"]
    assert stack["attn"]["wq"]["kernel_q4"].dtype == jnp.int8
    # (L, half_p, out): in=128 -> half 64 padded to the 128-row block
    assert stack["attn"]["wq"]["kernel_q4"].shape == (2, 128, 128)
    assert streamed["lm"]["lm_head"]["kernel_q4"].dtype == jnp.int8

    def leaves_with_paths(t):
        from vlrlhf_tpu.core.partitioning import tree_paths

        return tree_paths(t)

    got = dict(leaves_with_paths(streamed))
    exp = dict(leaves_with_paths(want))
    for path, a in got.items():
        b = exp[path]
        if path.endswith("kernel_q4"):
            au = np.asarray(unpack_int4(a.reshape(-1, a.shape[-1])), np.int32)
            bu = np.asarray(unpack_int4(b.reshape(-1, b.shape[-1])), np.int32)
            diff = np.abs(au - bu)
            assert diff.max() <= 1, (path, diff.max())
            assert (diff > 0).mean() < 0.01, (path, (diff > 0).mean())
        else:
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32), path
            )


_RSS_WORKER = r"""
import json, os, resource, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from vlrlhf_tpu.utils import hf_port

mode, path = sys.argv[1], sys.argv[2]

def anon_mb():
    # RssAnon: anonymous (heap/array) memory only — mmap'd checkpoint pages
    # are reclaimable page cache and must not count against the port
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon"):
                return int(line.split()[1]) / 1024.0

jnp.zeros((1,)).block_until_ready()  # init backend before baseline
base = anon_mb()
if mode == "stream":
    sd = hf_port.open_hf_state_dict(path)
    with hf_port.port_dtype(jnp.bfloat16):
        tree = hf_port.port_llama_lm(sd, 8)
else:
    sd = hf_port.load_hf_state_dict(path)
    tree = hf_port.cast_tree(hf_port.port_llama_lm(sd, 8), jnp.bfloat16)
jax.block_until_ready(tree)
end = anon_mb()
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps({"base": base, "end": end, "delta": end - base,
                  "maxrss": peak}))
"""


@pytest.mark.slow
def test_streaming_port_bounds_host_rss(tmp_path):
    """Peak RSS of the streaming port stays well under the eager port's
    (which holds the full f32 state dict + a full device tree + transposed
    copies at once)."""
    sd = _llama_sd(vocab=4096, hidden=768, inter=1536, n_layers=8)
    total_mb = sum(v.nbytes for v in sd.values()) / 1e6
    ckpt = tmp_path / "ckpt"
    _write_shards(sd, ckpt, n_shards=4)
    del sd
    script = tmp_path / "worker.py"
    script.write_text(_RSS_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    env.pop("XLA_FLAGS", None)

    def run(mode):
        out = subprocess.run(
            [sys.executable, str(script), mode, str(ckpt)],
            env=env, capture_output=True, text=True, timeout=600,
            cwd=os.getcwd(),
        )
        assert out.returncode == 0, out.stdout + out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])

    stream = run("stream")
    eager = run("eager")
    # eager holds the full f32 state dict + device trees at once; streaming
    # ends with just the bf16 tree + allocator slack. Decisive separation:
    assert stream["delta"] < 0.6 * eager["delta"], (stream, eager, total_mb)
    # absolute bound: ~bf16 tree (= total/2) + ~1.3 shards of slack
    shard_mb = total_mb / 4
    assert stream["delta"] < total_mb / 2 + 1.3 * shard_mb + 60, (
        stream, total_mb
    )
