"""Pipeline parallelism (models/lm/pipeline.py): the GPipe-scheduled stack
must be MATH-IDENTICAL to the plain scanned decoder — same hidden states,
same loss, same gradients (params and adapters) — on a virtual mesh with a
pipe axis. PP is schedule, not approximation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlrlhf_tpu.core.mesh import MeshConfig, make_mesh
from vlrlhf_tpu.lora.lora import LoraConfig, init_lora
from vlrlhf_tpu.models.common import Ctx
from vlrlhf_tpu.models.lm.llama import LMConfig, init_lm_params, lm_forward


def _cfg(**kw):
    base = dict(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=4, num_heads=4, num_kv_heads=2,
        dtype=jnp.float32, remat=False,
    )
    base.update(kw)
    return LMConfig(**base)


def _loss(cfg, params, ids, mask, ctx):
    logits, _ = lm_forward(
        cfg, params, input_ids=ids, pad_mask=mask, ctx=ctx
    )
    tgt = jnp.roll(ids, -1, axis=1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -(tok * mask).sum() / mask.sum()


def _data(b=4, s=16, seed=0):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (b, s), 1, 128)
    lens = jnp.asarray([s - (i % 3) for i in range(b)])
    mask = jnp.arange(s)[None, :] < lens[:, None]
    return ids, mask


@pytest.mark.parametrize("pipe,micro", [(2, 0), (4, 0), (2, 4)])
def test_pipeline_matches_plain_scan(pipe, micro):
    cfg0 = _cfg()
    params = init_lm_params(cfg0, jax.random.PRNGKey(0))
    ids, mask = _data()
    ctx = Ctx(attn_impl="xla")  # same attention math on both sides

    make_mesh(MeshConfig(data=1, fsdp=8 // pipe, model=1, pipe=1))
    want_loss, want_grads = jax.value_and_grad(
        lambda p: _loss(cfg0, p, ids, mask, ctx)
    )(params)

    cfgp = _cfg(pipeline_stages=pipe, pipeline_microbatches=micro)
    make_mesh(MeshConfig(data=1, fsdp=8 // pipe, model=1, pipe=pipe))
    got_loss, got_grads = jax.jit(jax.value_and_grad(
        lambda p: _loss(cfgp, p, ids, mask, ctx)
    ))(params)

    np.testing.assert_allclose(
        float(got_loss), float(want_loss), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        ),
        got_grads, want_grads,
    )
    make_mesh(MeshConfig())  # restore default global mesh for other tests


def test_pipeline_with_adapters_and_remat():
    """LoRA adapters (stacked per layer) ride the stage split; remat inside
    the stage body keeps grads identical."""
    cfg0 = _cfg(remat=True, remat_policy="attn")
    params = init_lm_params(cfg0, jax.random.PRNGKey(1))
    lcfg = LoraConfig(r=4, alpha=8, dropout=0.0,
                      target_patterns=(r"attn/(wq|wv)", r"mlp/gate"))
    adapters = init_lora(params, lcfg, jax.random.PRNGKey(2))
    # randomize b so the delta is nonzero
    adapters = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(
            jax.random.PRNGKey(3), a.shape, a.dtype
        ),
        adapters,
    )
    ids, mask = _data(seed=4)

    def loss(ad, cfg):
        ctx = Ctx(adapters=ad, lora_scale=lcfg.scale, attn_impl="xla")
        return _loss(cfg, params, ids, mask, ctx)

    make_mesh(MeshConfig(data=1, fsdp=4, model=1, pipe=1))
    want_loss, want_grads = jax.value_and_grad(
        lambda a: loss(a, cfg0)
    )(adapters)

    cfgp = dataclasses.replace(cfg0, pipeline_stages=2)
    make_mesh(MeshConfig(data=1, fsdp=4, model=1, pipe=2))
    got_loss, got_grads = jax.jit(jax.value_and_grad(
        lambda a: loss(a, cfgp)
    ))(adapters)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        ),
        got_grads, want_grads,
    )
    make_mesh(MeshConfig())
