"""CLIP towers: shape/pruning behavior + EOT identity preservation."""

import numpy as np
import jax.numpy as jnp

from madtp_tpu.core.config import CLIPConfig
from madtp_tpu.models import clip as C

CFG = CLIPConfig(
    embed_dim=16,
    image_resolution=32,
    vision_layers=3,
    vision_width=32,
    vision_patch_size=8,
    vision_heads_override=4,
    context_length=12,
    vocab_size=60,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=3,
    sd_dim=32,
)


def setup(B=2, seed=0):
    rng = np.random.RandomState(seed)
    params = C.init_clip_params(CFG, rng)
    images = rng.randn(B, 3, 32, 32).astype(np.float32)
    # text: sot=57, random toks, eot=59 (highest id), pad=0
    text = np.zeros((B, CFG.context_length), np.int64)
    text[0, :6] = [57, 5, 9, 13, 21, 59]
    text[1, :9] = [57, 3, 4, 5, 6, 7, 8, 9, 59]
    sd = rng.randn(11, CFG.sd_dim).astype(np.float32)
    return params, images, text, sd


def test_image_tower_prunes():
    params, images, text, sd = setup()
    f0, sd0, kept0 = C.clip_encode_image(
        params, jnp.asarray(images), CFG, space_dict=jnp.asarray(sd),
        temperature=0.0, prune_active=False,
    )
    f1, sd1, kept1 = C.clip_encode_image(
        params, jnp.asarray(images), CFG, space_dict=jnp.asarray(sd),
        temperature=1.0, prune_active=True,
    )
    assert f0.shape == (2, CFG.embed_dim)
    assert np.all(np.isfinite(np.asarray(f1)))
    # pruning must monotonically not increase kept counts over layers
    k = np.asarray(kept1)
    assert k[-1] <= 16  # started with 16 patches


def test_text_tower_keeps_eot_alive():
    params, images, text, sd = setup()
    f, sd_all, kept = C.clip_encode_text(
        params, jnp.asarray(text), CFG, space_dict=jnp.asarray(sd),
        temperature=1.0, prune_active=True,
    )
    assert np.all(np.isfinite(np.asarray(f)))
    # max_keep = max EOT pos + 2 = 10 -> at most one prune below 10 kept
    assert np.asarray(kept)[-1] >= 9


def test_text_causal_mask():
    """Future tokens must not influence the EOT feature: changing tokens after
    EOT position must not change the feature."""
    params, images, text, sd = setup()
    f1, _, _ = C.clip_encode_text(params, jnp.asarray(text), CFG)
    text2 = text.copy()
    text2[0, 7:] = 33  # after sample-0 EOT at pos 5
    f2, _, _ = C.clip_encode_text(params, jnp.asarray(text2), CFG)
    np.testing.assert_allclose(np.asarray(f1)[0], np.asarray(f2)[0], rtol=1e-5)
