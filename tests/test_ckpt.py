"""Checkpoint subsystem: torch .pth roundtrip through export -> load -> remap."""

import numpy as np
import pytest

from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.ckpt.export import (
    export_med,
    export_vit,
    load_native,
    save_native,
    save_torch_checkpoint,
)
from madtp_tpu.ckpt.remap import interpolate_pos_embed, remap_med, remap_vit
from madtp_tpu.ckpt.torch_reader import load_state_dict
from madtp_tpu.models.med import init_med_params
from madtp_tpu.models.vit import init_vit_params

VIT = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                num_heads=4, sd_dim=32)
MED = MedConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=32, encoder_width=32)


def trees_close(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            trees_close(a[k], b[k], path + "." + k)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=path)


def test_vit_pth_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tree = init_vit_params(VIT, rng)
    sd = export_vit(tree, patch_size=VIT.patch_size)
    path = str(tmp_path / "ckpt.pth")
    save_torch_checkpoint(path, sd, epoch=3, temperature=2.5)
    sd2, extras = load_state_dict(path)
    assert extras["temperature"] == 2.5 and extras["epoch"] == 3
    tree2 = remap_vit(sd2)
    trees_close(tree, tree2)


@pytest.mark.parametrize("twin", [False, True])
def test_med_pth_roundtrip(tmp_path, twin):
    rng = np.random.RandomState(1)
    cfg = MedConfig(**{**MED.__dict__, "twin_cross": twin})
    tree = init_med_params(cfg, rng)
    # merge_start_layer=0: export ALL merge layers so the roundtrip compares
    # full trees (the default 6 drops semantically-dead sub-merge-layer
    # weights to match the reference model's exact shape)
    sd = export_med(tree, "text_encoder.", twin_cross=twin,
                    merge_start_layer=0)
    path = str(tmp_path / "ckpt.pth")
    save_torch_checkpoint(path, sd)
    sd2, _ = load_state_dict(path)
    tree2 = remap_med(sd2, "text_encoder.", twin_cross=twin)
    tree.pop("cls")  # not exported without lm head
    trees_close(tree, tree2)


def test_med_lm_head_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    tree = init_med_params(MED, rng)
    tree.pop("pooler")
    sd = export_med(tree, "text_decoder.", has_lm_head=True)
    path = str(tmp_path / "d.pth")
    save_torch_checkpoint(path, sd)
    sd2, _ = load_state_dict(path)
    tree2 = remap_med(sd2, "text_decoder.", has_lm_head=True)
    trees_close(tree, tree2)


def test_nlvr_base_checkpoint_key_duplication(tmp_path):
    """A *base* (non-twin) checkpoint must load into the twin-cross tree with
    self->self0/self1 duplication (reference models/blip_nlvr.py:146-156)."""
    rng = np.random.RandomState(3)
    base = init_med_params(MED, rng)  # single-stream cross-attn
    sd = export_med(base, "text_encoder.")
    path = str(tmp_path / "base.pth")
    save_torch_checkpoint(path, sd)
    sd2, _ = load_state_dict(path)
    twin = remap_med(sd2, "text_encoder.", twin_cross=True)
    ca = twin["layers"]["crossattention"]
    np.testing.assert_allclose(
        ca["self0"]["query"]["kernel"], ca["self1"]["query"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(ca["self0"]["query"]["kernel"]),
        np.asarray(base["layers"]["crossattention"]["self"]["query"]["kernel"]),
        rtol=1e-6,
    )
    # merge_layer absent in base ckpt -> zero-init
    assert np.all(np.asarray(ca["output"]["merge_layer"]["kernel"]) == 0)


def test_pos_embed_interpolation():
    rng = np.random.RandomState(4)
    pe = rng.randn(1, 1 + 16, 8).astype(np.float32)  # 4x4 grid
    out = interpolate_pos_embed(pe, num_patches=64)  # -> 8x8
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # cls untouched
    out_same = interpolate_pos_embed(pe, num_patches=16)
    np.testing.assert_allclose(out_same, pe)


def test_native_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    tree = init_vit_params(VIT, rng)
    p = str(tmp_path / "native.npz")
    save_native(p, tree, extras={"temperature": 1.5, "step": 7})
    tree2, extras = load_native(p)
    trees_close(tree, tree2)
    assert extras == {"temperature": 1.5, "step": 7}


def test_pure_python_reader_matches_torch(tmp_path):
    """The torch-free zipfile+pickle fallback reads the same tensors."""
    import torch

    from madtp_tpu.ckpt.torch_reader import _load_pure_python

    rng = np.random.RandomState(6)
    sd = {
        "a.weight": torch.from_numpy(rng.randn(4, 6).astype(np.float32)),
        "b.bias": torch.from_numpy(rng.randn(3).astype(np.float16)),
        "c": torch.from_numpy(rng.randint(0, 5, (2, 2)).astype(np.int64)),
    }
    path = str(tmp_path / "t.pth")
    torch.save({"model": sd, "temperature": 0.5}, path)
    obj = _load_pure_python(path)
    assert obj["temperature"] == 0.5
    for k, v in sd.items():
        np.testing.assert_array_equal(obj["model"][k], v.numpy())


def test_clip_pth_roundtrip(tmp_path):
    from madtp_tpu.ckpt.export import export_clip
    from madtp_tpu.ckpt.remap import remap_clip
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.models.clip import init_clip_params

    cfg = CLIPConfig(
        embed_dim=16, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, vision_heads_override=4, context_length=12,
        vocab_size=60, transformer_width=32, transformer_heads=4,
        transformer_layers=2, sd_dim=32,
    )
    rng = np.random.RandomState(7)
    tree = init_clip_params(cfg, rng)
    # q_map in init is [L, D, sd_dim=32]; export/remap roundtrip
    sd = export_clip(tree)
    path = str(tmp_path / "clip.pth")
    save_torch_checkpoint(path, sd, temperature=1.25)
    sd2, extras = load_state_dict(path)
    assert extras["temperature"] == 1.25
    tree2 = remap_clip(sd2)
    trees_close(tree, tree2)


def test_flax_vit_npz_loader(tmp_path):
    """Original flax ViT .npz checkpoints load and produce the same forward
    as the torch-path remap (reference models/vit.py:318-395)."""
    import jax
    import jax.numpy as jnp

    from madtp_tpu.ckpt.remap import load_flax_vit_npz
    from madtp_tpu.models.vit import vit_forward

    rng = np.random.RandomState(8)
    D, depth, heads, p, img = 32, 2, 4, 8, 32
    g = img // p
    npz = {
        "embedding/kernel": rng.randn(p, p, 3, D).astype(np.float32) * 0.05,
        "embedding/bias": rng.randn(D).astype(np.float32) * 0.01,
        "cls": rng.randn(1, 1, D).astype(np.float32) * 0.02,
        "Transformer/posembed_input/pos_embedding":
            rng.randn(1, g * g + 1, D).astype(np.float32) * 0.02,
        "Transformer/encoder_norm/scale": np.ones(D, np.float32),
        "Transformer/encoder_norm/bias": np.zeros(D, np.float32),
    }
    Dh = D // heads
    for i in range(depth):
        b = f"Transformer/encoderblock_{i}/"
        mha = b + "MultiHeadDotProductAttention_1/"
        for n in ("query", "key", "value"):
            npz[mha + f"{n}/kernel"] = rng.randn(D, heads, Dh).astype(np.float32) * 0.05
            npz[mha + f"{n}/bias"] = np.zeros((heads, Dh), np.float32)
        npz[mha + "out/kernel"] = rng.randn(heads, Dh, D).astype(np.float32) * 0.05
        npz[mha + "out/bias"] = np.zeros(D, np.float32)
        npz[b + "LayerNorm_0/scale"] = np.ones(D, np.float32)
        npz[b + "LayerNorm_0/bias"] = np.zeros(D, np.float32)
        npz[b + "LayerNorm_2/scale"] = np.ones(D, np.float32)
        npz[b + "LayerNorm_2/bias"] = np.zeros(D, np.float32)
        npz[b + "MlpBlock_3/Dense_0/kernel"] = rng.randn(D, 4 * D).astype(np.float32) * 0.05
        npz[b + "MlpBlock_3/Dense_0/bias"] = np.zeros(4 * D, np.float32)
        npz[b + "MlpBlock_3/Dense_1/kernel"] = rng.randn(4 * D, D).astype(np.float32) * 0.05
        npz[b + "MlpBlock_3/Dense_1/bias"] = np.zeros(D, np.float32)
    path = str(tmp_path / "vit.npz")
    np.savez(path, **npz)

    tree = load_flax_vit_npz(path)
    cfg = ViTConfig(image_size=img, patch_size=p, embed_dim=D, depth=depth,
                    num_heads=heads)
    x = jnp.asarray(rng.randn(2, 3, img, img).astype(np.float32))
    state, _, _ = vit_forward(jax.tree.map(jnp.asarray, tree), x, cfg=cfg)
    out = np.asarray(state.x)
    assert out.shape == (2, 1 + g * g, D) and np.isfinite(out).all()


def test_load_native_old_two_file_format(tmp_path):
    """Pre-r3 checkpoints stored extras as a sidecar .json; the single-file
    (atomic) format embeds them in the npz.  Loading must support both."""
    import json
    import os

    from madtp_tpu.ckpt.export import load_native, save_native

    old = str(tmp_path / "old.npz")
    np.savez(old, ab=np.arange(3.0))
    json.dump({"epoch": 2}, open(str(tmp_path / "old.json"), "w"))
    tree, extras = load_native(old, require_extras=True)
    assert extras == {"epoch": 2}
    assert np.array_equal(tree["ab"], np.arange(3.0))

    new = str(tmp_path / "new.npz")
    save_native(new, {"a": {"b": np.arange(3.0)}}, extras={"epoch": 5})
    assert not os.path.exists(str(tmp_path / "new.json"))  # single file
    tree2, extras2 = load_native(new, require_extras=True)
    assert extras2 == {"epoch": 5}
    assert "__extras_json__" not in tree2
    assert np.array_equal(tree2["a"]["b"], np.arange(3.0))


def test_save_native_bfloat16_roundtrip(tmp_path):
    """npz cannot represent ml_dtypes (bf16 degrades to void |V2 and jax
    rejects the load — found by the on-chip serving A/B, whose bf16
    weights.npz failed in the fresh serving process).  save_native stores
    the raw bits + dtype name and load_native views them back."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from madtp_tpu.ckpt.export import load_native, save_native

    tree = {"w": jnp.asarray(np.arange(6).reshape(2, 3), jnp.bfloat16),
            "scalar": jnp.asarray(1.5, jnp.bfloat16),
            "f32": np.ones((2,), np.float32)}
    save_native(str(tmp_path / "bf.npz"), tree, extras={"t": 2.0})
    back, extras = load_native(str(tmp_path / "bf.npz"))
    assert extras == {"t": 2.0}
    assert np.asarray(back["w"]).dtype == ml_dtypes.bfloat16
    assert np.asarray(back["scalar"]).shape == ()
    np.testing.assert_array_equal(
        np.asarray(back["w"], np.float32), np.arange(6).reshape(2, 3))
    assert float(np.asarray(back["scalar"], np.float32)) == 1.5
    # and the loaded tree is jax-ingestible (the serving path)
    jax.tree.map(jnp.asarray, back)
