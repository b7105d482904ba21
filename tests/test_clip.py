"""CLIP towers: shape/pruning behavior + EOT identity preservation."""

import numpy as np
import jax
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


def test_modified_resnet_golden_vs_reference():
    """ModifiedResNet visual tower vs the unmodified reference module
    (clip/model.py:97-156).  Constructed standalone: the reference's own
    CLIP integration passes sd_dim/space_dict into a constructor/forward
    that doesn't accept them (broken as shipped) — the tower itself is the
    well-defined oracle."""
    import pytest

    torch = pytest.importorskip("torch")
    import os
    import sys

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    from tests import torch_shims

    torch_shims.install()

    refclip = sys.modules.get("ref_clip_model")
    if refclip is None:
        import importlib.util as ilu

        def _load(name, p):
            spec = ilu.spec_from_file_location(name, p)
            mod = ilu.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        _load("ref_clip_mock", "/root/reference/clip/mock.py")
        refclip = _load("ref_clip_model", "/root/reference/clip/model.py")

    layers, width, res, out_dim = (1, 1, 1, 1), 16, 64, 32
    heads = width * 32 // 64
    ref = refclip.ModifiedResNet(layers=layers, output_dim=out_dim,
                                 heads=heads, input_resolution=res,
                                 width=width)
    ref.eval()

    rng = np.random.RandomState(0)
    sd = {}
    for k, v in ref.state_dict().items():
        if v.dtype != torch.float32:
            sd[k] = v
            continue
        arr = (rng.randn(*v.shape) * 0.1).astype(np.float32)
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5  # variances must be positive
        sd[k] = torch.from_numpy(arr)
    ref.load_state_dict(sd)

    x = rng.randn(2, 3, res, res).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    from madtp_tpu.ckpt.remap import _remap_resnet_visual
    from madtp_tpu.models.clip_resnet import modified_resnet_forward

    np_sd = {"visual." + k: v.numpy() for k, v in sd.items()
             if v.dtype == torch.float32}
    params = jax.tree.map(jnp.asarray, _remap_resnet_visual(np_sd))
    ours = np.asarray(modified_resnet_forward(
        params, jnp.asarray(x), layers=layers, width=width))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_clip_resnet_checkpoint_config_and_forward():
    """infer_clip_config detects RN checkpoints and clip_encode_image runs
    the RN tower end-to-end from a remapped state dict."""
    from madtp_tpu.ckpt.remap import remap_clip
    from madtp_tpu.cli.compress_retrieval_clip import infer_clip_config
    from madtp_tpu.models.clip import clip_encode_image
    from madtp_tpu.models.clip_resnet import (
        init_modified_resnet_params, resnet_gflops,
    )

    rng = np.random.RandomState(1)
    layers, width, res, out_dim = (1, 1, 1, 1), 16, 64, 32

    # synthesize a torch-layout RN CLIP state dict from our init tree
    vp = init_modified_resnet_params(layers, width, res, out_dim, rng)
    sd = {}
    st = vp["stem"]
    for i in (1, 2, 3):
        sd[f"visual.conv{i}.weight"] = st[f"conv{i}"]
        for nm, ours_k in (("weight", "scale"), ("bias", "bias"),
                           ("running_mean", "mean"), ("running_var", "var")):
            sd[f"visual.bn{i}.{nm}"] = st[f"bn{i}"][ours_k]
    for li in range(1, 5):
        for bi, bp in enumerate(vp[f"layer{li}"]):
            b = f"visual.layer{li}.{bi}."
            for ci in (1, 2, 3):
                sd[b + f"conv{ci}.weight"] = bp[f"conv{ci}"]
                for nm, ok in (("weight", "scale"), ("bias", "bias"),
                               ("running_mean", "mean"), ("running_var", "var")):
                    sd[b + f"bn{ci}.{nm}"] = bp[f"bn{ci}"][ok]
            if "downsample" in bp:
                sd[b + "downsample.0.weight"] = bp["downsample"]["conv"]
                for nm, ok in (("weight", "scale"), ("bias", "bias"),
                               ("running_mean", "mean"), ("running_var", "var")):
                    sd[b + f"downsample.1.{nm}"] = bp["downsample"]["bn"][ok]
    ap = vp["attnpool"]
    sd["visual.attnpool.positional_embedding"] = ap["positional_embedding"]
    for nm in ("q_proj", "k_proj", "v_proj", "c_proj"):
        sd[f"visual.attnpool.{nm}.weight"] = ap[nm]["kernel"].T
        sd[f"visual.attnpool.{nm}.bias"] = ap[nm]["bias"]
    # minimal text tower
    tw, tl, ctx, vocab = 32, 1, 12, 60
    sd["text_projection"] = rng.randn(tw, out_dim).astype(np.float32)
    sd["positional_embedding"] = rng.randn(ctx, tw).astype(np.float32)
    sd["token_embedding.weight"] = rng.randn(vocab, tw).astype(np.float32)
    sd["ln_final.weight"] = np.ones(tw, np.float32)
    sd["ln_final.bias"] = np.zeros(tw, np.float32)
    sd["logit_scale"] = np.float32(0.0)
    for i in range(tl):
        b = f"transformer.resblocks.{i}."
        for nm, shape in (("ln_1.weight", (tw,)), ("ln_1.bias", (tw,)),
                          ("ln_2.weight", (tw,)), ("ln_2.bias", (tw,)),
                          ("attn.in_proj_weight", (3 * tw, tw)),
                          ("attn.in_proj_bias", (3 * tw,)),
                          ("attn.out_proj.weight", (tw, tw)),
                          ("attn.out_proj.bias", (tw,)),
                          ("mlp.c_fc.weight", (4 * tw, tw)),
                          ("mlp.c_fc.bias", (4 * tw,)),
                          ("mlp.c_proj.weight", (tw, 4 * tw)),
                          ("mlp.c_proj.bias", (tw,))):
            sd[b + nm] = (rng.randn(*shape) * 0.05).astype(np.float32)

    cfg = infer_clip_config(sd, sd_dim=32)
    assert cfg.is_resnet and cfg.resnet_layers == layers
    assert cfg.image_resolution == res and cfg.vision_width == width

    params = jax.tree.map(jnp.asarray, remap_clip(sd))
    images = rng.randn(2, 3, res, res).astype(np.float32)
    feats, sd_ft, kept = clip_encode_image(
        params, jnp.asarray(images), cfg, temperature=1.0, prune_active=True)
    assert feats.shape == (2, out_dim) and sd_ft is None
    assert np.all(np.isfinite(np.asarray(feats)))
    assert resnet_gflops(layers, width, res, out_dim) > 0


def test_image_tower_gather_matches_mask_mode():
    """CLIP vision gather fast path: with lossless capacities (kept + 2) the
    compacted tower's features must equal mask mode (same DTP decisions,
    physical compaction is a re-indexing; CLS is slot 0 in both)."""
    params, images, text, sd = setup()
    t = 1.0
    f_mask, sd_mask, kept = C.clip_encode_image(
        params, jnp.asarray(images), CFG, space_dict=jnp.asarray(sd),
        temperature=t, prune_active=True,
    )
    caps = tuple(int(k) + 2 for k in np.asarray(kept))
    f_gat, sd_gat, kept_g = C.clip_encode_image(
        params, jnp.asarray(images), CFG, space_dict=jnp.asarray(sd),
        temperature=t, prune_active=True, capacities=caps,
    )
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(kept_g))
    np.testing.assert_allclose(np.asarray(f_mask), np.asarray(f_gat),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(sd_mask), np.asarray(sd_gat),
                               rtol=2e-5, atol=2e-6)
