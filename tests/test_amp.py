"""--amp mixed-precision training (reference compress_*_dtp.py '--amp':
fp16 autocast + GradScaler, e.g. compress_nlvr_dtp.py:46-59,172,265).

TPU-native contract (train/loops._amp_cast): bf16 COMPUTE against fp32
master params — so after an amp step (1) the updated params and optimizer
state are still fp32, (2) the loss matches the fp32 step to bf16 rounding,
(3) retrieval/CLIP feature queues stay fp32.  No GradScaler counterpart
exists or is needed (bf16 carries fp32's exponent range)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.models.med import init_med_params
from madtp_tpu.models.vit import init_vit_params
from madtp_tpu.train import loops
from madtp_tpu.train.momentum import init_queue

VIT = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                num_heads=4, sd_dim=32)
MED = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=32, encoder_width=32, sd_dim=32)
CFG = BlipConfig(vit=VIT, med=MED, sd_dim=32)

# bf16 has ~8 significant bits; small-model losses agree to a few percent
LOSS_RTOL = 5e-2


def _assert_fp32_tree(tree, name):
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, (name, path, leaf.dtype)


def _nlvr_params(rng):
    return jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_encoder": init_med_params(
            MedConfig(**{**MED.__dict__, "twin_cross": True}), rng),
        "space_dict": rng.randn(10, 32).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": rng.randn(32, 32).astype(np.float32) * 0.02,
                    "bias": np.zeros(32, np.float32)},
            "fc2": {"kernel": rng.randn(32, 2).astype(np.float32) * 0.02,
                    "bias": np.zeros(2, np.float32)},
        },
    })


def test_nlvr_amp_step_fp32_masters_and_close_loss():
    rng = np.random.RandomState(0)
    cfg = BlipConfig(
        vit=VIT, med=MedConfig(**{**MED.__dict__, "twin_cross": True}),
        sd_dim=32)
    tx = optax.adamw(1e-4)
    B = 2
    images = jnp.asarray(rng.randn(2 * B, 3, 32, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, (B, 8)))
    mask = jnp.ones((B, 8), jnp.int32)
    targets = jnp.asarray([0, 1])

    losses = {}
    out_params = {}
    for amp in (False, True):
        params = _nlvr_params(np.random.RandomState(0))
        step = loops.make_nlvr_train_step(cfg, tx, amp=amp)
        params2, _, metrics = step(params, tx.init(params), images, ids,
                                   mask, targets, jnp.float32(1.0))
        losses[amp] = float(metrics["loss"])
        out_params[amp] = params2

    _assert_fp32_tree(out_params[True], "nlvr params post-amp-step")
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=LOSS_RTOL)
    # the amp step trained: params moved and track the fp32 step's update
    a = np.asarray(out_params[True]["cls_head"]["fc1"]["kernel"])
    b = np.asarray(out_params[False]["cls_head"]["fc1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_caption_amp_step():
    rng = np.random.RandomState(1)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_decoder": init_med_params(MED, rng),
        "space_dict": rng.randn(10, 32).astype(np.float32),
    })
    tx = optax.adamw(1e-4)
    B = 2
    images = jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, (B, 8)))
    mask = jnp.ones((B, 8), jnp.int32)
    labels = jnp.where(ids > 2, ids, -100)

    losses = {}
    for amp in (False, True):
        step = loops.make_caption_train_step(CFG, tx, amp=amp)
        p = jax.tree.map(jnp.copy, params)
        p2, _, metrics = step(p, tx.init(p), images, ids, mask, labels,
                              jnp.float32(1.0), jax.random.PRNGKey(0))
        losses[amp] = float(metrics["loss"])
        if amp:
            _assert_fp32_tree(p2, "caption params post-amp-step")
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=LOSS_RTOL)


def test_vqa_amp_step():
    rng = np.random.RandomState(2)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_encoder": init_med_params(MED, rng),
        "text_decoder": init_med_params(MED, rng),
        "space_dict": rng.randn(10, 32).astype(np.float32),
    })
    tx = optax.adamw(1e-4)
    K, B = 3, 2
    images = jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32))
    q_ids = jnp.asarray(rng.randint(1, 60, (B, 8)))
    q_mask = jnp.ones((B, 8), jnp.int32)
    a_ids = jnp.asarray(rng.randint(1, 60, (B, K, 5)))
    a_mask = jnp.ones((B, K, 5), jnp.int32)
    weights = jnp.asarray([[0.5, 0.5, 0.0], [1.0, 0.0, 0.0]], jnp.float32)

    losses = {}
    for amp in (False, True):
        step = loops.make_vqa_train_step(CFG, tx, max_answers_per_q=K,
                                         amp=amp)
        p = jax.tree.map(jnp.copy, params)
        p2, _, metrics = step(p, tx.init(p), images, q_ids, q_mask, a_ids,
                              a_mask, weights, jnp.float32(1.0))
        losses[amp] = float(metrics["loss_vqa"])
        if amp:
            _assert_fp32_tree(p2, "vqa params post-amp-step")
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=LOSS_RTOL)


def test_retrieval_amp_step_queue_stays_fp32():
    rng = np.random.RandomState(3)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_encoder": init_med_params(MED, rng),
        "space_dict": rng.randn(10, 32).astype(np.float32),
        "vision_proj": {"kernel": rng.randn(32, 16).astype(np.float32) * .02,
                        "bias": np.zeros(16, np.float32)},
        "text_proj": {"kernel": rng.randn(32, 16).astype(np.float32) * .02,
                      "bias": np.zeros(16, np.float32)},
        "itm_head": {"kernel": rng.randn(32, 2).astype(np.float32) * .02,
                     "bias": np.zeros(2, np.float32)},
    })
    tx = optax.adamw(1e-4)
    B = 4
    images = jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, (B, 8)))
    mask = jnp.ones((B, 8), jnp.int32)

    losses = {}
    for amp in (False, True):
        step = loops.make_retrieval_train_step(CFG, tx, enc_token_id=58,
                                               amp=amp)
        state = loops.RetrievalTrainState(
            params=jax.tree.map(jnp.copy, params),
            params_m={k: jax.tree.map(jnp.copy, params[k])
                      for k in loops.MOMENTUM_KEYS},
            opt_state=tx.init(params),
            queue=init_queue(16, 8),
            temp=jnp.float32(0.07),
        )
        state2, metrics = step(state, jax.random.PRNGKey(0), images, ids,
                               mask, jnp.arange(B), jnp.float32(1.0))
        losses[amp] = float(metrics["loss"])
        if amp:
            _assert_fp32_tree(state2.params, "retrieval params")
            _assert_fp32_tree(state2.params_m, "retrieval momentum params")
            assert state2.queue.image.dtype == jnp.float32
            assert state2.queue.text.dtype == jnp.float32
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=LOSS_RTOL)


def test_clip_amp_step():
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.models.clip import init_clip_params

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, vision_heads_override=4, context_length=12,
        vocab_size=60, transformer_width=32, transformer_heads=4,
        transformer_layers=2, sd_dim=32,
    )
    rng = np.random.RandomState(4)
    params = jax.tree.map(jnp.asarray, init_clip_params(cfg, rng))
    space_dict = jnp.asarray(rng.randn(10, 32).astype(np.float32))
    tx = optax.adamw(1e-4)
    B = 4
    images = jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32))
    text = np.zeros((B, 12), np.int64)
    text[:, 0] = 57
    text[:, 1:4] = rng.randint(5, 50, size=(B, 3))
    text[:, 4] = 59  # eot

    losses = {}
    for amp in (False, True):
        step = loops.make_clip_train_step(cfg, tx, amp=amp)
        state = loops.ClipTrainState(
            params=jax.tree.map(jnp.copy, params),
            params_m={k: jax.tree.map(jnp.copy, params[k])
                      for k in loops.CLIP_MOMENTUM_KEYS},
            opt_state=tx.init({"params": params, "space_dict": space_dict}),
            queue=init_queue(16, 8),
            space_dict=jnp.copy(space_dict),
        )
        state2, metrics = step(state, images, jnp.asarray(text),
                               jnp.arange(B), jnp.float32(1.0))
        losses[amp] = float(metrics["loss"])
        if amp:
            _assert_fp32_tree(state2.params, "clip params")
            assert state2.space_dict.dtype == jnp.float32
            assert state2.queue.image.dtype == jnp.float32
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=LOSS_RTOL)
