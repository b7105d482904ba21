"""Quantify gather-mode calibration drift (VERDICT r1 item 6 / weak #4).

Gather mode uses STATIC per-layer capacities calibrated from mask-mode kept
counts on one probe batch.  Two drift sources:

1. capacities calibrated on batch A, evaluated on batches B..N whose keep
   counts differ (margin absorbs most of it; overflow folds into the merge
   token);
2. ``mode='nearest'`` rounding (the 128-lane bench schedule) deliberately
   clamps layers just past a lane boundary.

These tests measure prediction flip-rate and accuracy delta between
mask-mode (exact reference semantics) and the two gather schedules across
fresh batches, and bound them.  The measured numbers are recorded in
COVERAGE.md.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.models.blip import BlipConfig
from madtp_tpu.models.med import init_med_params
from madtp_tpu.models.vit import init_vit_params
from madtp_tpu.prune.calibrate import calibrate_capacities
from madtp_tpu.tasks import nlvr as task

# Tiny model: 16 patches; granularity 8 (ceil) vs 16 (nearest) plays the
# role of the full model's 64 vs 128-lane rounding relative to ~580 tokens.
VIT = ViTConfig(image_size=64, patch_size=16, embed_dim=64, depth=2,
                num_heads=4, sd_dim=64)
MED = MedConfig(vocab_size=60, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=256,
                max_position_embeddings=32, encoder_width=64, sd_dim=64,
                twin_cross=True)
CFG = BlipConfig(vit=VIT, med=MED, sd_dim=64)


def _params(rng):
    return jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_encoder": init_med_params(MED, rng),
        "space_dict": rng.randn(8, 64).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": rng.randn(64, 64).astype(np.float32) * 0.02,
                    "bias": np.zeros(64, np.float32)},
            "fc2": {"kernel": rng.randn(64, 2).astype(np.float32) * 0.02,
                    "bias": np.zeros(2, np.float32)},
        },
    })


def _batches(n_batches, B, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        out.append((rng.randn(2 * B, 3, 64, 64).astype(np.float32),
                    rng.randint(1, 60, (B, 10)).astype(np.int32),
                    np.ones((B, 10), np.int32)))
    return out


def test_gather_calibration_drift_quantified(capsys):
    rng = np.random.RandomState(0)
    params = _params(rng)
    T = jnp.float32(1.0)
    B = 8

    # probe batch A -> capacities; eval batches B..N are fresh draws
    probe = _batches(1, B, seed=100)[0]
    evals = _batches(6, B, seed=200)

    mask_step = task.make_eval_step(CFG, True)
    _, vk, tk = mask_step(params, *map(jnp.asarray, probe), T)
    caps_ceil = calibrate_capacities(np.asarray(vk)[None], margin=2,
                                     multiple=8)
    caps_t = calibrate_capacities(np.asarray(tk)[None], margin=2, multiple=8)
    # explicit ~20% clamp: the magnitude the bench's nearest-128 schedule
    # applies at full scale (mask keeps ~310/layer -> cap_p 254, i.e. ~18%
    # of kept tokens fold into the merge token in 10 of 12 layers)
    caps_clamp = tuple(int(k) - 1 + 2 - max(1, int(0.2 * int(k)))
                       for k in np.asarray(vk))
    assert all(c - 2 < int(k) for c, k in zip(caps_clamp, np.asarray(vk)))

    steps = {
        "gather_ceil": task.make_eval_step(CFG, True, caps_ceil, caps_t),
        "gather_clamp20": task.make_eval_step(CFG, True, caps_clamp, caps_t),
    }
    # verify the clamp really engages: gather kept counts pinned at capacity
    _, gvk, _ = steps["gather_clamp20"](params, *map(jnp.asarray, probe), T)
    assert all(int(g) < int(k) for g, k in zip(np.asarray(gvk),
                                               np.asarray(vk)))

    flips = {k: 0 for k in steps}
    dlogit = {k: 0.0 for k in steps}
    total = 0
    for images, ids, mask in evals:
        args = (jnp.asarray(images), jnp.asarray(ids), jnp.asarray(mask))
        ref_logits, _, _ = mask_step(params, *args, T)
        ref_pred = np.asarray(ref_logits).argmax(-1)
        total += len(ref_pred)
        for name, step in steps.items():
            logits, _, _ = step(params, *args, T)
            pred = np.asarray(logits).argmax(-1)
            flips[name] += int((pred != ref_pred).sum())
            dlogit[name] = max(
                dlogit[name],
                float(np.abs(np.asarray(logits) - np.asarray(ref_logits)).max()))

    report = {k: {"flip_rate": flips[k] / total, "max_dlogit": dlogit[k]}
              for k in steps}
    print("CALIBRATION DRIFT (mask-mode reference, fresh batches):", report)

    # ceil calibration is the lossless schedule: cross-batch variance beyond
    # the margin is the only drift source — must stay small
    assert report["gather_ceil"]["flip_rate"] <= 0.05
    # 20% clamp (the bench's nearest-128 schedule magnitude); bounded
    assert report["gather_clamp20"]["flip_rate"] <= 0.25


def test_retrieval_gather_drift_quantified():
    """R@k drift of calibrated gather eval vs mask-mode on a fixture corpus
    (reference compress_retrieval_dtp.py:142-178)."""
    from madtp_tpu.eval.metrics import itm_eval
    from madtp_tpu.tasks.retrieval import encode_corpus, rerank_scores

    rng = np.random.RandomState(0)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(VIT, rng),
        "text_encoder": init_med_params(
            MedConfig(vocab_size=60, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=256,
                      max_position_embeddings=32, encoder_width=64,
                      sd_dim=64), rng),
        "space_dict": rng.randn(8, 64).astype(np.float32),
        "vision_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                        "bias": np.zeros(16, np.float32)},
        "text_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                      "bias": np.zeros(16, np.float32)},
        "itm_head": {"kernel": rng.randn(64, 2).astype(np.float32) * 0.1,
                     "bias": np.zeros(2, np.float32)},
    })
    cfg = BlipConfig(vit=VIT, med=MED._replace(twin_cross=False)
                     if hasattr(MED, "_replace") else MED, sd_dim=64)
    from dataclasses import replace as _rep

    med = _rep(MED, twin_cross=False)
    cfg = BlipConfig(vit=VIT, med=med, sd_dim=64)

    n = 8
    images = [rng.randn(4, 3, 64, 64).astype(np.float32),
              rng.randn(4, 3, 64, 64).astype(np.float32)]
    text_ids = rng.randint(1, 60, (n, 9)).astype(np.int32)
    text_mask = np.ones((n, 9), np.int32)
    txt2img = {i: i for i in range(n)}
    img2txt = {i: [i] for i in range(n)}

    def run(caps_v, caps_t):
        feats = encode_corpus(params, cfg, iter(images), text_ids, text_mask,
                              temperature=1.0, prune_active=True,
                              capacities_v=caps_v, capacities_t=caps_t)
        s = rerank_scores(params, cfg, *feats, text_ids, text_mask,
                          k_test=n, temperature=1.0, prune_active=True,
                          capacities_t=caps_t)
        return itm_eval(*s, txt2img, img2txt)

    stats_mask = run(None, None)

    # calibrate on the FIRST image batch / first 4 texts only
    import madtp_tpu.models.vit as V
    from madtp_tpu.models import med as MM

    _, _, vk = V.vit_forward(params["visual_encoder"], jnp.asarray(images[0]),
                             cfg=VIT, space_dict=params["space_dict"],
                             temperature=jnp.float32(1.0), prune_active=True)
    tout = MM.med_encoder(params["text_encoder"], jnp.asarray(text_ids[:4]),
                          jnp.asarray(text_mask[:4]), med, mode="text",
                          space_dict=params["space_dict"],
                          temperature=jnp.float32(1.0), prune_active=True)
    caps_v = calibrate_capacities(np.asarray(vk)[None], margin=2, multiple=8)
    caps_t = calibrate_capacities(np.asarray(tout.kept_counts)[None],
                                  margin=2, multiple=8)
    stats_ceil = run(caps_v, caps_t)

    # explicit ~20% clamp (the bench nearest-128 magnitude, see above)
    caps_v_clamp = tuple(int(k) - 1 + 2 - max(1, int(0.2 * int(k)))
                         for k in np.asarray(vk))
    stats_clamp = run(caps_v_clamp, caps_t)

    d_ceil = abs(stats_ceil["r_mean"] - stats_mask["r_mean"])
    d_clamp = abs(stats_clamp["r_mean"] - stats_mask["r_mean"])
    print("RETRIEVAL DRIFT r_mean: mask=%.2f ceil=%.2f (d=%.2f) "
          "clamp20=%.2f (d=%.2f)" % (stats_mask["r_mean"],
                                     stats_ceil["r_mean"], d_ceil,
                                     stats_clamp["r_mean"], d_clamp))
    assert d_ceil <= 10.0
    assert d_clamp <= 15.0


@pytest.mark.skipif(not os.environ.get("MADTP_FULL_GOLDEN"),
                    reason="set MADTP_FULL_GOLDEN=1 (slow, base-scale)")
def test_fullsize_vit_calibration_drift():
    """FULL-SIZE drift (VERDICT r2 weak #2 'keep extending toward
    full-size'): ViT-B/16@384 (577 tokens, 12 layers) at the bench
    temperature 3.5 — capacities calibrated EXACTLY as the drivers do
    (cli/common.fast_capacity_schedule: 2 shuffled probe batches in mask
    mode, margin 16, ceil-64 lossless / nearest-128 bench lane schedule),
    then fresh batches compared mask-vs-gather on the CLS feature (the
    only thing every task head consumes from the tower).  At this scale
    per-batch keep counts swing by ~20 tokens/layer (measured: a
    single-probe margin-2 schedule drifts 7% rel-L2 — the reason the
    drivers probe multiple batches).  Measured numbers go to COVERAGE.md.
    """
    from madtp_tpu.cli.common import fast_capacity_schedule
    from madtp_tpu.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig()  # base @ 384
    rng = np.random.RandomState(0)
    params = jax.tree.map(jnp.asarray, init_vit_params(cfg, rng))
    space = jnp.asarray((rng.randn(100, 768) * 0.2).astype(np.float32))
    T = jnp.float32(3.5)

    fns = {}

    def run(images, capacities=None):
        if capacities not in fns:
            fns[capacities] = jax.jit(
                lambda p, im, sd, t: vit_forward(
                    p, im, cfg=cfg, space_dict=sd, temperature=t,
                    prune_active=True, capacities=capacities))
        st, _, kept = fns[capacities](params, jnp.asarray(images), space, T)
        return np.asarray(st.x[:, 0]), np.asarray(kept)

    probes = [rng.randn(2, 3, 384, 384).astype(np.float32)
              for _ in range(2)]
    vks = np.stack([run(p)[1] for p in probes])
    caps_ceil, _ = fast_capacity_schedule(vks, None, "ceil")
    caps_128, _ = fast_capacity_schedule(vks, None, "nearest")
    print("probe kept:", vks.tolist())
    print("ceil64:", caps_ceil, "near128:", caps_128)

    rels = {"ceil": [], "near128": []}
    for seed in (10, 11, 12):
        imgs = np.random.RandomState(seed).randn(
            2, 3, 384, 384).astype(np.float32)
        cls_mask, _ = run(imgs)
        for name, caps in (("ceil", caps_ceil), ("near128", caps_128)):
            cls_g, _ = run(imgs, caps)
            rel = (np.linalg.norm(cls_g - cls_mask, axis=-1)
                   / np.linalg.norm(cls_mask, axis=-1))
            rels[name].append(float(rel.max()))
    print("FULLSIZE DRIFT rel-L2(CLS): ceil=%s near128=%s"
          % (rels["ceil"], rels["near128"]))

    # driver lossless schedule: only cross-batch variance beyond the
    # multi-probe max + margin-16 can leak into the merge token
    assert max(rels["ceil"]) <= 1e-2
    # bench lane schedule deliberately clamps layers just past a 128-lane
    # boundary; bounded, measured
    assert max(rels["near128"]) <= 0.15
