"""North-star check (BASELINE.md): per-step DPO loss parity within 1e-3 vs
the HF/torch reference pipeline, end to end on a tiny LLaVA.

torch side: HF LlavaForConditionalGeneration logits -> the reference
trainer's get_batch_logps + dpo_loss formulas
(/root/reference/src/vlrlhf/base/trainer.py:148-301, re-implemented in torch
here as the oracle). jax side: ported weights -> vlm_forward -> batch_logps
-> dpo_loss. Policy and reference are two independently-initialized models so
the loss is non-trivial.
"""
import pytest as _pytest

# heavy (torch-oracle / multi-process spawn) — excluded from the
# fast gate via `pytest -m "not slow"`
pytestmark = _pytest.mark.slow


import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_hf_port import _sd, _tiny_llava
from vlrlhf_tpu.models.lm.llama import LMConfig
from vlrlhf_tpu.models.vision.vit import ViTConfig
from vlrlhf_tpu.models.vlm import ProjectorConfig, VLMConfig, vlm_forward
from vlrlhf_tpu.train.losses import batch_logps, dpo_loss
from vlrlhf_tpu.utils.hf_port import port_llava

torch.manual_seed(1)


def _torch_logps(logits, labels):
    labels = labels[:, 1:].clone()
    logits = logits[:, :-1, :]
    mask = labels != -100
    labels[labels == -100] = 0
    per_tok = torch.gather(
        logits.log_softmax(-1), 2, labels.unsqueeze(2)
    ).squeeze(2)
    return (per_tok * mask).sum(-1)


def test_dpo_step_loss_parity_within_1e3():
    policy_hf = _tiny_llava()
    torch.manual_seed(7)
    ref_hf = _tiny_llava()  # independently initialized reference

    n_img = 4
    b2, s = 4, 24  # [chosen; rejected] for 2 pairs
    ids = torch.randint(0, 90, (b2, s))
    ids[:, 3 : 3 + n_img] = 99
    labels = ids.clone()
    labels[:, : s // 2] = -100
    pixels = torch.randn(b2, 3, 28, 28)

    with torch.no_grad():
        pol_logits = policy_hf(input_ids=ids, pixel_values=pixels).logits
        ref_logits = ref_hf(input_ids=ids, pixel_values=pixels).logits
    pl = _torch_logps(pol_logits.float(), labels)
    rl = _torch_logps(ref_logits.float(), labels)
    beta = 0.1
    t_logits = (pl[:2] - pl[2:]) - (rl[:2] - rl[2:])
    want = (-F.logsigmoid(beta * t_logits)).mean().item()

    cfg = VLMConfig(
        lm=LMConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
            num_heads=4, num_kv_heads=4, rms_eps=1e-5, dtype=jnp.float32,
            remat=False,
        ),
        vision=ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=3,
            num_heads=4, mlp_dim=64, act="quick_gelu", feature_layer=-2,
            drop_class_token=True, dtype=jnp.float32, remat=False,
        ),
        projector=ProjectorConfig(kind="mlp2x_gelu", in_dim=32, out_dim=48),
        image_token_id=99,
        num_image_tokens=n_img,
    )
    img_pos = jnp.broadcast_to(
        jnp.arange(3, 3 + n_img)[None], (b2, n_img)
    ).astype(jnp.int32)
    px = jnp.asarray(pixels.numpy().transpose(0, 2, 3, 1))[:, None]
    j_ids = jnp.asarray(ids.numpy())
    j_labels = jnp.asarray(labels.numpy())

    def our_logps(hf_model):
        params = port_llava(_sd(hf_model), cfg)
        logits, _ = vlm_forward(
            cfg, params, input_ids=j_ids, pixel_values=px,
            image_positions=img_pos, pad_mask=jnp.ones((b2, s), bool),
        )
        return batch_logps(logits, j_labels)

    jpl = our_logps(policy_hf)
    jrl = our_logps(ref_hf)
    out = dpo_loss(jpl[:2], jpl[2:], jrl[:2], jrl[2:], beta=beta)
    got = float(out.loss)
    assert abs(got - want) < 1e-3, (got, want)
    # per-sequence logps themselves agree tightly too
    np.testing.assert_allclose(np.asarray(jpl), pl.numpy(), atol=5e-3, rtol=1e-3)
