"""AOT serving artifacts (madtp_tpu/serve): export -> load -> call parity.

The artifact is a serialized ``jax.export`` graph + weights npz + meta —
the deployment path the reference lacks (its only serving mode is re-running
the research stack, ``compress_*_dtp.py --evaluate``)."""

import numpy as np

import jax
import jax.numpy as jnp

from madtp_tpu.serve import load_artifact, save_artifact


def _tiny_nlvr(B=2, image_size=64, text_len=12):
    from __graft_entry__ import _nlvr_setup

    return _nlvr_setup(
        image_size=image_size, B=B, text_len=text_len,
        vit_kw=dict(patch_size=16, embed_dim=64, depth=2, num_heads=4,
                    sd_dim=64),
        med_kw=dict(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=256,
                    max_position_embeddings=64),
    )


def test_nlvr_mask_artifact_roundtrip(tmp_path):
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()

    def fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    t = jnp.float32(1.0)
    art = str(tmp_path / "nlvr")
    save_artifact(art, fn, params, (images, ids, mask, t),
                  meta={"task": "nlvr", "temperature": 1.0})

    model = load_artifact(art)
    got_logits, got_vk, got_tk = model(images, ids, mask, t)
    want_logits, want_vk, want_tk = jax.jit(fn)(params, images, ids, mask, t)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_vk), np.asarray(want_vk))
    np.testing.assert_array_equal(np.asarray(got_tk), np.asarray(want_tk))
    assert model.meta["task"] == "nlvr"
    assert model.meta["platforms"] == ["cpu"]

    # temperature is a call-time input (traced in the artifact too): a new
    # temperature changes pruning without a new artifact
    alt = model(images, ids, mask, jnp.float32(8.0))
    assert not np.array_equal(np.asarray(alt[1]), np.asarray(got_vk))


def test_artifact_weights_are_inputs_not_constants(tmp_path):
    """The graph must be weight-agnostic: rebinding new weights changes the
    output (nothing was baked at export time)."""
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg, params, images, ids, mask, _ = _tiny_nlvr()

    def fn(params, images, ids, mask, t):
        return blip_nlvr_forward(params, images, ids, mask, cfg,
                                 temperature=t, prune_active=True)[0]

    t = jnp.float32(1.0)
    art = str(tmp_path / "nlvr")
    save_artifact(art, fn, params, (images, ids, mask, t), meta={})
    model = load_artifact(art)
    base = np.asarray(model(images, ids, mask, t))

    scaled = jax.tree.map(lambda a: a * 1.5, model.params)
    rebound = model.rebind(scaled)
    swapped = np.asarray(rebound(images, ids, mask, t))
    assert not np.allclose(base, swapped)
    # and the rebound output equals running fn with the scaled weights
    np.testing.assert_allclose(
        swapped, np.asarray(jax.jit(fn)(scaled, images, ids, mask, t)),
        atol=1e-6)

    # serving-path perf invariants (found by the on-chip A/B, round 4):
    # rebind shares the jit wrapper (same executable cache — a weight swap
    # must not recompile) and loaded params are device-committed arrays,
    # not host numpy that a jitted call would re-upload per invocation
    assert rebound._jitted is model._jitted
    for leaf in jax.tree.leaves(model.params):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_sharded_artifact_multidevice(tmp_path):
    """Pod-slice serving: export the eval step pjit'ed over a 4x2
    (data, model) mesh — shardings ride inside the artifact (XLA inserted
    the collectives at export) — reload with the mesh REBUILT from
    meta.json, and match the single-device result.  The reference's only
    multi-GPU mode is torchrun re-tracing per process."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.parallel.mesh import (
        make_mesh,
        model_parallel_param_shardings,
    )

    cfg, params, images, ids, mask, _ = _tiny_nlvr(B=4)

    def fn(params, images, ids, mask, t):
        logits, (vk, tk) = blip_nlvr_forward(
            params, images, ids, mask, cfg, temperature=t, prune_active=True)
        return logits, vk, tk

    t = jnp.float32(1.0)
    mesh = make_mesh(n_data=4, n_model=2)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jf = jax.jit(fn, in_shardings=(
        model_parallel_param_shardings(mesh, params), data, data, data, repl))

    art = str(tmp_path / "nlvr_pod")
    save_artifact(art, jf, params, (images, ids, mask, t),
                  meta={"task": "nlvr"}, mesh=mesh)
    model = load_artifact(art)  # mesh auto-rebuilt from meta
    assert model.meta["nr_devices"] == 8
    assert model.meta["mesh"] == {"axis_names": ["data", "model"],
                                  "shape": [4, 2]}
    # params actually live across the mesh
    assert any(len(leaf.sharding.device_set) == 8
               for leaf in jax.tree.leaves(model.params))

    got = model(np.asarray(images), np.asarray(ids), np.asarray(mask),
                np.asarray(t))
    want = jax.jit(fn)(params, images, ids, mask, t)
    np.testing.assert_allclose(np.asarray(got[0]),
                               np.asarray(want[0]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))

    # rebind keeps the shardings and the compiled graph
    rebound = model.rebind(jax.tree.map(lambda a: a * 1.5, model.params))
    assert rebound._jitted is model._jitted
    out2 = rebound(np.asarray(images), np.asarray(ids), np.asarray(mask),
                   np.asarray(t))
    assert not np.allclose(np.asarray(out2[0]), np.asarray(got[0]))

    # a single-device export must refuse a mesh-less multi-device fn
    import pytest

    with pytest.raises(ValueError, match="pass the mesh"):
        save_artifact(str(tmp_path / "bad"), jf, params,
                      (images, ids, mask, t))


def test_nlvr_gather_artifact(tmp_path):
    """Gather fast path (static capacities) exports and matches the live
    jitted step."""
    from madtp_tpu.tasks.nlvr import make_eval_step

    cfg, params, images, ids, mask, _ = _tiny_nlvr()
    caps_v, caps_t = (24, 16), (8, 8)
    step = make_eval_step(cfg, True, caps_v, caps_t)
    t = jnp.float32(1.0)

    art = str(tmp_path / "nlvr_gather")
    save_artifact(art, step, params, (images, ids, mask, t),
                  meta={"mode": "gather", "capacities_vision": list(caps_v)})
    model = load_artifact(art)
    got = model(images, ids, mask, t)
    want = step(params, images, ids, mask, t)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_clip_artifacts(tmp_path):
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.models.clip import (clip_encode_image, clip_encode_text,
                                       init_clip_params)

    cfg = CLIPConfig(embed_dim=32, image_resolution=32, vision_layers=2,
                     vision_width=64, vision_patch_size=16, context_length=16,
                     vocab_size=80, transformer_width=32, transformer_heads=4,
                     transformer_layers=2, sd_dim=32)
    rng0 = np.random.RandomState(0)
    params = init_clip_params(cfg, rng0)
    params["space_dict"] = rng0.randn(10, cfg.sd_dim).astype(np.float32)
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    text = jnp.asarray(
        np.concatenate([np.full((2, 1), 77), rng.randint(1, 70, (2, 14)),
                        np.full((2, 1), 79)], axis=1).astype(np.int32))
    t = jnp.float32(1.0)

    def img_fn(params, images, t):
        feats, _, kept = clip_encode_image(
            params, images, cfg, space_dict=params["space_dict"],
            temperature=t, prune_active=True)
        return feats, kept

    def txt_fn(params, text, t):
        feats, _, kept = clip_encode_text(
            params, text, cfg, space_dict=params["space_dict"],
            temperature=t, prune_active=True)
        return feats, kept

    save_artifact(str(tmp_path / "img"), img_fn, params, (images, t), meta={})
    save_artifact(str(tmp_path / "txt"), txt_fn, params, (text, t), meta={})

    img = load_artifact(str(tmp_path / "img"))
    txt = load_artifact(str(tmp_path / "txt"))
    gi, _ = img(images, t)
    gt, _ = txt(text, t)
    wi, _, _ = jax.jit(lambda p, im, t: clip_encode_image(
        p, im, cfg, space_dict=p["space_dict"], temperature=t,
        prune_active=True))(params, images, t)
    wt, _, _ = jax.jit(lambda p, tx, t: clip_encode_text(
        p, tx, cfg, space_dict=p["space_dict"], temperature=t,
        prune_active=True))(params, text, t)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(wi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=1e-6)


def test_export_serving_cli_clip_pretrained_space_dict(tmp_path, monkeypatch,
                                                       capsys):
    """A compressed CLIP .pth stores space_dict in the raw state dict
    (the driver reads it there, compress_retrieval_clip.py:129) while
    remap_clip returns a tower tree without it — the exporter must inject
    it or the artifact prunes WITHOUT the MAG term (ADVICE r3, high)."""
    import yaml

    from madtp_tpu.ckpt.export import export_clip, save_torch_checkpoint
    from madtp_tpu.cli import export_serving
    from madtp_tpu.core.config import CLIPConfig
    from madtp_tpu.models.clip import clip_encode_image, init_clip_params

    # head counts must be width//64 so --evaluate-style shape inference
    # reconstructs the same arch (reference clip/model.py:684,697 rule)
    cfg = CLIPConfig(
        embed_dim=16, image_resolution=64, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=32, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        sd_dim=64,
    )
    rng = np.random.RandomState(3)
    sd = export_clip(init_clip_params(cfg, rng))
    sd["space_dict"] = rng.randn(10, 64).astype(np.float32)
    pre = str(tmp_path / "clip_compressed.pth")
    save_torch_checkpoint(pre, sd, temperature=1.0)

    cfg_yaml = tmp_path / "clip_tiny.yaml"
    yaml.safe_dump({"sd_dim": 64}, cfg_yaml.open("w"))
    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["export_serving", "--task", "clip", "--config", str(cfg_yaml),
         "--pretrained", pre, "--output_dir", str(out), "--batch", "2"])
    export_serving.main()
    assert "exported CLIP serving artifacts" in capsys.readouterr().out

    img = load_artifact(str(out / "image_encoder"))
    assert "space_dict" in img.params  # the regression: was silently dropped
    assert img.meta["temperature"] == 1.0 and img.meta["mode"] == "mask"

    rng2 = np.random.RandomState(7)
    images = jnp.asarray(rng2.randn(2, 3, 64, 64).astype(np.float32))
    t = jnp.float32(1.0)
    got, got_kept = img(images, t)

    with_sd, _, kept_sd = jax.jit(
        lambda p, im, t: clip_encode_image(
            p, im, cfg, space_dict=p["space_dict"], temperature=t,
            prune_active=True))(img.params, images, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(with_sd),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_kept), np.asarray(kept_sd))
    # pruning actually ran (DTP needs the MAG term; without space_dict the
    # pruned tower is untraceable, so parity above proves the term shipped)
    n_patches = (cfg.image_resolution // cfg.vision_patch_size) ** 2
    assert np.asarray(got_kept).min() < n_patches


def test_probe_npz_validation(tmp_path):
    """--probe_npz must supply >= the export's leading batch count (NLVR:
    2*batch) and may carry real probe text as 'ids'/'mask' (ADVICE r3)."""
    import pytest

    from madtp_tpu.cli.export_serving import _probe_images, _probe_text

    class A:
        probe_npz = str(tmp_path / "probe.npz")
        probe_sentences = ""

    np.savez(A.probe_npz, images=np.zeros((3, 3, 8, 8), np.float32),
             ids=np.arange(40, dtype=np.int64).reshape(4, 10),
             mask=np.ones((4, 10), np.int64))
    with pytest.raises(SystemExit, match="needs 4"):
        _probe_images(A, (4, 3, 8, 8))  # only 3 images for 2*batch=4
    imgs = _probe_images(A, (2, 3, 8, 8))
    assert imgs.shape == (2, 3, 8, 8)

    ids, mask = _probe_text(A, 2, 10)
    np.testing.assert_array_equal(ids, np.arange(20).reshape(2, 10))
    assert mask.shape == (2, 10)
    with pytest.raises(SystemExit, match="do not cover"):
        _probe_text(A, 2, 12)  # text_len mismatch


def test_save_artifact_meta_collision(tmp_path):
    """Caller meta must not overwrite the recorded ground-truth keys
    (inputs/platforms/jax_version) — built-ins win (ADVICE r3, low)."""
    f = lambda p, x: x * p["w"]
    params = {"w": jnp.float32(2.0)}
    art = save_artifact(str(tmp_path / "a"), f, params, (jnp.float32(3.0),),
                        meta={"platforms": ["lies"], "task": "toy"})
    m = load_artifact(art).meta
    assert m["platforms"] == ["cpu"] and m["task"] == "toy"


def _tiny_yaml(tmp_path):
    import yaml

    p = tmp_path / "tiny.yaml"
    yaml.safe_dump({"vit": "tiny", "image_size": 64}, p.open("w"))
    return str(p)


def test_export_serving_cli_caption_beam(tmp_path, monkeypatch, capsys):
    """Caption artifact: the whole jitted beam search (lax.fori_loop +
    KV cache) exports and reproduces the live decode token-for-token."""
    from madtp_tpu.cli import export_serving
    from madtp_tpu.cli.common import build_blip_cfg
    from madtp_tpu.models.blip import blip_caption_encode_image
    from madtp_tpu.tasks.caption import beam_generate

    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "caption", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--prompt_len", "3",
         "--max_length", "8", "--min_length", "2", "--eos_id", "90"])
    export_serving.main()
    assert "exported caption serving artifact" in capsys.readouterr().out

    model = load_artifact(str(out))
    assert model.meta["task"] == "caption" and model.meta["num_beams"] == 3

    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    prompt = jnp.asarray(rng.randint(1, 80, (2, 3)).astype(np.int32))
    t = jnp.float32(1.0)
    seqs, vkept = model(images, prompt, t)
    assert seqs.shape == (2, 8)

    cfg = build_blip_cfg({"vit": "tiny", "image_size": 64}, 64)

    def live(params, images, prompt, t):
        vstate, _, vk = blip_caption_encode_image(
            params, images, cfg, temperature=t, prune_active=True)
        return beam_generate(params["text_decoder"], vstate, prompt, cfg,
                             num_beams=3, max_length=8, min_length=2,
                             eos_token_id=90, pad_token_id=0), vk

    want, want_vk = jax.jit(live)(model.params, images, prompt, t)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(vkept), np.asarray(want_vk))


def test_export_serving_cli_vqa_rank(tmp_path, monkeypatch, capsys):
    """VQA rank artifact: answer list is a call-time input — rank against
    one list, then swap lists WITHOUT re-exporting."""
    from madtp_tpu.cli import export_serving

    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "vqa", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--text_len", "10",
         "--num_answers", "12", "--answer_len", "6", "--k_test", "4"])
    export_serving.main()
    assert "exported VQA rank" in capsys.readouterr().out

    model = load_artifact(str(out))
    assert model.meta["k_test"] == 4

    rng = np.random.RandomState(6)
    images = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    q_ids = jnp.asarray(rng.randint(1, 80, (2, 10)).astype(np.int32))
    q_mask = jnp.ones((2, 10), jnp.int32)
    a_ids = jnp.asarray(rng.randint(1, 80, (12, 6)).astype(np.int32))
    a_mask = jnp.ones((12, 6), jnp.int32)
    t = jnp.float32(1.0)
    best, topk, vk, tk = model(images, q_ids, q_mask, a_ids, a_mask, t)
    assert best.shape == (2,) and topk.shape == (2, 4)
    assert all(int(b) in np.asarray(topk)[i] for i, b in enumerate(best))
    # swapped answer list -> same graph, (generally) different ranking
    a2 = jnp.asarray(rng.randint(1, 80, (12, 6)).astype(np.int32))
    best2, *_ = model(images, q_ids, q_mask, a2, a_mask, t)
    assert best2.shape == (2,)


def test_export_serving_cli_retrieval(tmp_path, monkeypatch, capsys):
    """Retrieval artifacts: towers + ITM rerank share one weights tree and
    the rerank consumes the image encoder's state outputs directly."""
    from madtp_tpu.cli import export_serving

    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "retrieval", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--text_len", "10",
         "--rerank_batch", "2"])
    export_serving.main()
    assert "exported retrieval serving artifacts" in capsys.readouterr().out

    img = load_artifact(str(out / "image_encoder"))
    txt = load_artifact(str(out / "text_encoder"))
    rr = load_artifact(str(out / "itm_rerank"))

    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 80, (2, 10)).astype(np.int32))
    mask = jnp.ones((2, 10), jnp.int32)
    t = jnp.float32(1.0)
    ifeat, sx, sa = img(images, t)
    tfeat, tkept = txt(ids, mask, t)
    assert ifeat.shape[0] == 2 and tfeat.shape == ifeat.shape
    # feed the image states straight into the rerank artifact
    scores = rr(ids, mask, sx, sa, t)
    assert np.asarray(scores).shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()

    # parity with the live ITM step on the same states
    from madtp_tpu.cli.common import build_blip_cfg
    from madtp_tpu.models.blip import blip_itm_score
    from madtp_tpu.prune.dtp import TokenState

    cfg = build_blip_cfg({"vit": "tiny", "image_size": 64}, 64)
    want = jax.jit(lambda p, i, m, x, a, t: blip_itm_score(
        p, i, m, TokenState(x, a, None), cfg, temperature=t,
        prune_active=True))(rr.params, ids, mask, sx, sa, t)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(want),
                               atol=1e-6)


def test_export_serving_cli(tmp_path, monkeypatch, capsys):
    """The CLI end-to-end on a tiny config: artifact written, loadable, and
    the served logits match a fresh forward with the artifact's weights."""
    import yaml

    from madtp_tpu.cli import export_serving
    from madtp_tpu.cli.common import build_blip_cfg
    from madtp_tpu.models.blip import blip_nlvr_forward

    cfg_yaml = tmp_path / "nlvr_tiny.yaml"
    yaml.safe_dump({"vit": "tiny", "image_size": 64}, cfg_yaml.open("w"))
    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["export_serving", "--task", "nlvr", "--config", str(cfg_yaml),
         "--output_dir", str(out), "--batch", "2", "--text_len", "12"])
    export_serving.main()
    assert "exported NLVR serving artifact" in capsys.readouterr().out

    model = load_artifact(str(out))
    assert model.meta["task"] == "nlvr"
    assert model.meta["mode"] == "mask"
    assert model.meta["temperature"] == 1.0

    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(4, 3, 64, 64).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 100, (2, 12)).astype(np.int32))
    mask = jnp.ones((2, 12), jnp.int32)
    t = jnp.float32(model.meta["temperature"])
    logits, vk, tk = model(images, ids, mask, t)
    assert logits.shape == (2, 2)

    blip_cfg = build_blip_cfg({"vit": "tiny", "image_size": 64}, 64,
                              twin_cross=True)
    want, _ = jax.jit(lambda p, im, i, m, t: blip_nlvr_forward(
        p, im, i, m, blip_cfg, temperature=t, prune_active=True))(
            model.params, images, ids, mask, t)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-6)

    # the CLI-recorded batching spec drives sub-batch serving correctly:
    # a 1-sample request through ArtifactServer (NLVR's image pair = rows
    # 0 and B of the stacked input) equals the full-batch run's row 0
    assert model.meta["batching"] == {"batch": 2, "inputs": [2, 1, 1, 0],
                                      "outputs": [1, 0, 0]}
    from madtp_tpu.serve.server import ArtifactServer

    srv = ArtifactServer(str(out), warmup=False, aggregate=False)
    try:
        im = np.asarray(images)
        sub = srv.predict([np.stack([im[0], im[2]]), np.asarray(ids)[:1],
                           np.asarray(mask)[:1], np.asarray(t)])
        assert sub[0].shape == (1, 2)
        np.testing.assert_allclose(sub[0][0], np.asarray(want)[0], atol=1e-5)
    finally:
        srv.server_close()


def test_export_serving_row_independent(tmp_path, monkeypatch, capsys):
    """--row_independent NLVR artifact: NATIVE per-row DTP semantics
    (prune/dtp.py row_independent flag — the fused kernel stays engaged,
    unlike the earlier vmap approach).

    (a) a row's result does not depend on co-tenants: row j of a full-batch
        call BIT-equals the same sample's solo 1-sample request (which the
        server pads with the sample's own rows);
    (b) consistency with the base step carrying the same flag at batch 1
        (decisions exact; values to fp tolerance — different batch sizes
        lower differently);
    (c) the artifact's spec flags row_independent, so the HTTP dispatcher
        may merge distinct requests: two merged 1-sample requests return
        exactly their solo results in ONE device call."""
    from madtp_tpu.cli import export_serving
    from madtp_tpu.cli.common import build_blip_cfg
    from madtp_tpu.models.blip import blip_nlvr_forward
    from madtp_tpu.serve.server import ArtifactServer, ServingClient

    out = tmp_path / "artifact"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "nlvr", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--text_len", "12",
         "--row_independent"])
    export_serving.main()
    capsys.readouterr()

    model = load_artifact(str(out))
    bat = model.meta["batching"]
    assert bat["row_independent"] is True
    # kept counts are per-row now: vision [2B, L] (pair blocks), text [B, L]
    assert bat["outputs"] == [1, 2, 1]

    blip_cfg = build_blip_cfg({"vit": "tiny", "image_size": 64}, 64,
                              twin_cross=True)
    rng = np.random.RandomState(9)
    images = rng.randn(4, 3, 64, 64).astype(np.float32)
    ids = rng.randint(1, 100, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    t = np.float32(model.meta["temperature"])

    logits, vk, tk = (np.asarray(o) for o in model(
        jnp.asarray(images), jnp.asarray(ids), jnp.asarray(mask),
        jnp.float32(t)))
    assert vk.shape[0] == 4 and tk.shape[0] == 2  # per-row kept counts

    # (b) base step with the same flag at batch 1: decisions exact,
    # values to fp tolerance
    base = jax.jit(lambda p, im, i, m, tt: blip_nlvr_forward(
        p, im, i, m, blip_cfg, temperature=tt, prune_active=True,
        row_independent=True))
    for j in range(2):
        solo_imgs = jnp.asarray(np.stack([images[j], images[2 + j]]))
        want, (wvk, wtk) = base(model.params, solo_imgs,
                                jnp.asarray(ids[j:j + 1]),
                                jnp.asarray(mask[j:j + 1]), jnp.float32(t))
        np.testing.assert_allclose(logits[j], np.asarray(want)[0],
                                   rtol=0, atol=1e-5)
        np.testing.assert_array_equal(
            np.stack([vk[j], vk[2 + j]], axis=1), np.asarray(wvk))
        np.testing.assert_array_equal(tk[j], np.asarray(wtk)[:, 0])

    srv = ArtifactServer(str(out))
    srv.start_background()
    try:
        rt = srv.default
        assert rt._aggregate  # merging enabled by the flag
        client = ServingClient(srv.url)

        def one(j):
            return client.predict(
                np.stack([images[j], images[2 + j]]), ids[j:j + 1],
                mask[j:j + 1], t)

        solo = [one(0), one(1)]
        # force a merge: hold the device lock so both requests queue
        import concurrent.futures
        import time

        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            srv._lock.acquire()
            try:
                req0 = rt.stats["requests"]
                futs = [ex.submit(one, 0)]
                deadline = time.time() + 10
                while not (rt.stats["requests"] > req0
                           and not rt._queue) and time.time() < deadline:
                    time.sleep(0.02)
                futs.append(ex.submit(one, 1))
                while len(rt._queue) < 1 and time.time() < deadline:
                    time.sleep(0.02)
            finally:
                srv._lock.release()
            outs = [f.result(timeout=60) for f in futs]
        for got, want in zip(outs, solo):
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)
    finally:
        srv.shutdown()


def test_export_serving_row_independent_caption_vqa(tmp_path, monkeypatch,
                                                    capsys):
    """--row_independent for the last two task families (caption beam decode
    and VQA answer ranking): downstream of the towers both are per-row by
    construction (beams attend only to their row's tokens; ranking tiles
    each question's memory), so the flag makes the whole step row-exact.
    Proof: swap row 1's inputs — row 0's outputs are unchanged bit-for-bit
    (on a batch-coupled artifact the batch-max keep counts would shift)."""
    from madtp_tpu.cli import export_serving

    # ---- caption ----
    out_c = tmp_path / "cap"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "caption", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out_c), "--batch", "2", "--prompt_len", "3",
         "--max_length", "8", "--min_length", "2", "--eos_id", "90",
         "--row_independent"])
    export_serving.main()
    cap = load_artifact(str(out_c))
    bat = cap.meta["batching"]
    assert bat["row_independent"] is True
    assert bat["outputs"] == [1, 1]
    assert bat["kept_outputs"] == {"1": "vision"}

    rng = np.random.RandomState(11)
    images = rng.randn(2, 3, 64, 64).astype(np.float32)
    prompt = rng.randint(1, 80, (2, 3)).astype(np.int32)
    t = jnp.float32(1.0)
    seqs, vk = (np.asarray(o) for o in cap(
        jnp.asarray(images), jnp.asarray(prompt), t))
    assert vk.shape[0] == 2  # batch-leading per-row kept counts

    images2, prompt2 = images.copy(), prompt.copy()
    images2[1] = rng.randn(3, 64, 64)
    prompt2[1] = rng.randint(1, 80, 3)
    seqs2, vk2 = (np.asarray(o) for o in cap(
        jnp.asarray(images2), jnp.asarray(prompt2), t))
    np.testing.assert_array_equal(seqs[0], seqs2[0])
    np.testing.assert_array_equal(vk[0], vk2[0])

    # ---- vqa ----
    out_v = tmp_path / "vqa"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "vqa", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out_v), "--batch", "2", "--text_len", "10",
         "--num_answers", "12", "--answer_len", "6", "--k_test", "4",
         "--row_independent"])
    export_serving.main()
    capsys.readouterr()
    vqa = load_artifact(str(out_v))
    bat = vqa.meta["batching"]
    assert bat["row_independent"] is True
    assert bat["outputs"] == [1, 1, 1, 1]
    assert bat["kept_outputs"] == {"2": "vision", "3": "text"}

    q_ids = rng.randint(1, 80, (2, 10)).astype(np.int32)
    q_mask = np.ones((2, 10), np.int32)
    a_ids = jnp.asarray(rng.randint(1, 80, (12, 6)).astype(np.int32))
    a_mask = jnp.ones((12, 6), jnp.int32)
    one = [np.asarray(o) for o in vqa(
        jnp.asarray(images), jnp.asarray(q_ids), jnp.asarray(q_mask),
        a_ids, a_mask, t)]
    assert one[2].shape[0] == 2 and one[3].shape[0] == 2  # per-row kept
    q_ids2 = q_ids.copy()
    q_ids2[1] = rng.randint(1, 80, 10)
    two = [np.asarray(o) for o in vqa(
        jnp.asarray(images2), jnp.asarray(q_ids2), jnp.asarray(q_mask),
        a_ids, a_mask, t)]
    for a, b in zip(one, two):
        np.testing.assert_array_equal(a[0], b[0])  # row 0 untouched


def test_row_independent_gather_overflow_surfaces_in_stats(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """ADVICE r4: a mis-calibrated gather schedule must be observable in
    production.  Force a deliberately tight capacity schedule on a
    row-independent caption export: the per-row kept counts report the DTP
    DECISION (> capacity-1), and the server's /stats gains
    overflow_rows/overflow_max."""
    from madtp_tpu.cli import export_serving
    from madtp_tpu.serve.server import ArtifactServer

    monkeypatch.setenv("MADTP_FORCE_CAPS_V", "6,6")
    out = tmp_path / "cap_ovf"
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--task", "caption", "--config", _tiny_yaml(tmp_path),
         "--output_dir", str(out), "--batch", "2", "--prompt_len", "3",
         "--max_length", "8", "--min_length", "2", "--eos_id", "90",
         "--temperature", "0.2", "--fast_eval", "--row_independent"])
    export_serving.main()
    capsys.readouterr()
    meta = load_artifact(str(out)).meta
    assert meta["mode"] == "gather"
    assert meta["capacities_vision"] == [6, 6]

    rng = np.random.RandomState(13)
    images = rng.randn(1, 3, 64, 64).astype(np.float32)
    prompt = rng.randint(1, 80, (1, 3)).astype(np.int32)

    srv = ArtifactServer(str(out), warmup=False, aggregate=False)
    try:
        seqs, vk = srv.predict([images, prompt, np.float32(0.2)])
        # premise: at T=0.2 the tiny tower wants to keep more than the
        # 5 tokens (cap-1) the forced schedule allows
        assert int(np.asarray(vk).max()) > 5
        st = srv.default.stats
        assert st["overflow_rows"] >= 1
        assert st["overflow_max"] >= int(np.asarray(vk).max()) - 5
    finally:
        srv.server_close()
