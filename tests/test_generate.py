"""Generation engine vs naive full-forward greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_dpo_step import IMG_TOKEN, N_IMG_TOKENS, tiny_vlm_config
from vlrlhf_tpu.generate.engine import GenerateConfig, Generator
from vlrlhf_tpu.models.vlm import init_vlm_params, vlm_forward


def _naive_greedy(cfg, params, ids_row, pixels, img_pos, n_new, eos_ids):
    """Reference decode: full uncached forward each step."""
    ids = list(np.asarray(ids_row))
    out = []
    for _ in range(n_new):
        arr = jnp.asarray([ids], jnp.int32)
        logits, _ = vlm_forward(
            cfg,
            params,
            input_ids=arr,
            pixel_values=pixels,
            image_positions=img_pos,
            pad_mask=jnp.ones_like(arr, bool),
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        if nxt in eos_ids:
            break
        ids.append(nxt)
    return out


def test_greedy_generation_matches_naive():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    n_new = 6

    # Two rows with different prompt lengths (right-padded).
    lens = [20, 26]
    L = 32
    rng = jax.random.PRNGKey(7)
    rows_ids = jax.random.randint(rng, (2, L), 5, 90)
    img_pos = jnp.broadcast_to(
        jnp.arange(2, 2 + N_IMG_TOKENS)[None], (2, N_IMG_TOKENS)
    ).astype(jnp.int32)
    rows_ids = jax.vmap(lambda r, p: r.at[p].set(IMG_TOKEN))(rows_ids, img_pos)
    pad_mask = jnp.arange(L)[None, :] < jnp.asarray(lens)[:, None]
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 3))

    gen_cfg = GenerateConfig(max_new_tokens=n_new, do_sample=False, pad_token_id=0)
    gen = Generator(cfg, gen_cfg)
    batch = {
        "input_ids": rows_ids,
        "pad_mask": pad_mask,
        "prompt_lens": jnp.asarray(lens, jnp.int32),
        "pixel_values": pixels,
        "image_positions": img_pos,
    }
    tokens = np.asarray(gen(params, batch))

    for i, ln in enumerate(lens):
        want = _naive_greedy(
            cfg, params, rows_ids[i, :ln], pixels[i : i + 1],
            img_pos[i : i + 1], n_new, eos_ids=set(),
        )
        np.testing.assert_array_equal(tokens[i], want, err_msg=f"row {i}")


def test_generation_eos_early_exit():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    L, ln = 16, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, L), 5, 90)
    pad_mask = jnp.arange(L)[None, :] < ln
    # find what greedy emits first, then make THAT the eos -> expect padding after
    gen = Generator(cfg, GenerateConfig(max_new_tokens=4, pad_token_id=0))
    batch = {
        "input_ids": ids, "pad_mask": pad_mask,
        "prompt_lens": jnp.asarray([ln], jnp.int32),
        "pixel_values": None, "image_positions": None,
    }
    tokens = np.asarray(gen(params, batch))
    first = int(tokens[0, 0])
    gen2 = Generator(
        cfg, GenerateConfig(max_new_tokens=4, pad_token_id=0,
                            eos_token_ids=(first,))
    )
    tokens2 = np.asarray(gen2(params, batch))
    assert (tokens2[0] == 0).all()  # eos emitted at step 0 -> all padded


def test_sampling_reproducible():
    cfg = tiny_vlm_config()
    params = init_vlm_params(cfg, jax.random.PRNGKey(0))
    L, ln = 16, 10
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, L), 5, 90)
    pad_mask = jnp.arange(L)[None, :] < ln
    gen = Generator(
        cfg,
        GenerateConfig(max_new_tokens=5, do_sample=True, temperature=0.8,
                       top_p=0.9, pad_token_id=0),
    )
    batch = {
        "input_ids": ids, "pad_mask": pad_mask,
        "prompt_lens": jnp.full((2,), ln, jnp.int32),
        "pixel_values": None, "image_positions": None,
    }
    t1 = np.asarray(gen(params, batch, rng=jax.random.PRNGKey(11)))
    t2 = np.asarray(gen(params, batch, rng=jax.random.PRNGKey(11)))
    np.testing.assert_array_equal(t1, t2)
