"""SPMD paths on the 8-fake-device CPU mesh: sharded eval, collectives,
TP param shardings (the reference's DDP/NCCL equivalents, SURVEY.md §2.5)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from madtp_tpu.parallel.mesh import (
    make_mesh,
    model_parallel_param_shardings,
)


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == 8


def test_data_parallel_eval_matches_single_device():
    """A jitted batch forward sharded over 'data' must equal the unsharded
    result (GSPMD correctness for the eval path)."""
    from madtp_tpu.core.config import ViTConfig
    from madtp_tpu.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    rng = np.random.RandomState(0)
    params = jax.tree.map(jnp.asarray, init_vit_params(cfg, rng))
    sd = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))

    def fwd(params, images, sd):
        state, _, kept = vit_forward(params, images, cfg=cfg, space_dict=sd,
                                     temperature=1.0, prune_active=True)
        return state.x, kept

    ref_x, ref_kept = jax.jit(fwd)(params, images, sd)

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        im_sharded = jax.device_put(images, NamedSharding(mesh, P("data")))
        p_rep = jax.device_put(params, NamedSharding(mesh, P()))
        sd_rep = jax.device_put(sd, NamedSharding(mesh, P()))
        x, kept = jax.jit(fwd)(p_rep, im_sharded, sd_rep)
    # NOTE: sharded batch max over samples still equals global (psum'd by GSPMD)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(ref_kept))


def test_tensor_parallel_ffn_matches():
    """FFN kernels sharded over 'model' must give identical outputs (XLA
    inserts the collectives)."""
    from madtp_tpu.core.config import ViTConfig
    from madtp_tpu.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    rng = np.random.RandomState(1)
    params = jax.tree.map(jnp.asarray, init_vit_params(cfg, rng))
    images = jnp.asarray(rng.randn(4, 3, 32, 32).astype(np.float32))

    def fwd(params, images):
        state, _, _ = vit_forward(params, images, cfg=cfg)
        return state.x

    ref = jax.jit(fwd)(params, images)

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        specs = model_parallel_param_shardings(mesh, params)
        p_tp = jax.tree_util.tree_map(jax.device_put, params, specs)
        im = jax.device_put(images, NamedSharding(mesh, P("data")))
        out = jax.jit(fwd)(p_tp, im)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    # check the fc1 kernel actually got sharded over 'model'
    fc1 = p_tp["blocks"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, None, "model")


def test_shard_map_collectives():
    """dist wrappers inside shard_map: differentiable all_gather + psum."""
    shard_map = jax.shard_map

    from madtp_tpu.parallel.dist import all_gather_with_grad, psum_scalar

    mesh = make_mesh(n_data=8, n_model=1)
    x = jnp.arange(16.0).reshape(8, 2)

    def f(xs):
        gathered = all_gather_with_grad(xs, "data")  # [8, 2] on every shard
        return jnp.sum(gathered * gathered)

    fm = shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P(),
                   check_vma=False)

    val = fm(x)
    assert float(val) == float(jnp.sum(x * x))
    # gradient flows through the gather (the reference needed a custom
    # autograd Function for this, models/blip_retrieval.py:348-364)
    g = jax.grad(lambda x: shard_map(
        f, mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False)(x))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * x), rtol=1e-6)

    def metric(xs):
        return psum_scalar(jnp.sum(xs), "data")

    total = shard_map(metric, mesh=mesh, in_specs=P("data"), out_specs=P(),
                      check_vma=False)(x)
    assert float(total) == float(jnp.sum(x))


def test_retrieval_score_matrix_reduction():
    """Row-sharded score matrices initialized at -100 merge by elementwise
    max across shards (equivalent to the reference's SUM over disjoint
    -100-filled slices, compress_retrieval_dtp.py:202-205, but without the
    additive -100*(n-1) offset)."""
    n_img, n_txt, shards = 8, 12, 4
    rng = np.random.RandomState(0)
    full = rng.rand(n_img, n_txt).astype(np.float32)
    pieces = []
    for s in range(shards):
        m = np.full((n_img, n_txt), -100.0, np.float32)
        rows = slice(s * n_img // shards, (s + 1) * n_img // shards)
        m[rows] = full[rows]
        pieces.append(m)
    merged = np.maximum.reduce(pieces)
    np.testing.assert_allclose(merged, full)


def test_nlvr_evaluate_on_mesh_matches_single_device():
    """Full task-level eval sharded over 8 fake devices == single-device."""
    from madtp_tpu.core.config import MedConfig, ViTConfig
    from madtp_tpu.models.blip import BlipConfig
    from madtp_tpu.models.med import init_med_params
    from madtp_tpu.models.vit import init_vit_params
    from madtp_tpu.tasks import nlvr as task

    vit = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    med = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=32, encoder_width=32, sd_dim=32,
                    twin_cross=True)
    cfg = BlipConfig(vit=vit, med=med, sd_dim=32)
    rng = np.random.RandomState(0)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(vit, rng),
        "text_encoder": init_med_params(med, rng),
        "space_dict": rng.randn(8, 32).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": rng.randn(32, 32).astype(np.float32) * 0.02,
                    "bias": np.zeros(32, np.float32)},
            "fc2": {"kernel": rng.randn(32, 2).astype(np.float32) * 0.02,
                    "bias": np.zeros(2, np.float32)},
        },
    })
    B = 8
    batches = [(rng.randn(B, 3, 32, 32).astype(np.float32),
                rng.randn(B, 3, 32, 32).astype(np.float32),
                ["x"] * B, rng.randint(0, 2, (B,)))]

    ids = rng.randint(1, 60, (B, 6)).astype(np.int32)
    mask = np.ones((B, 6), np.int32)

    def tokenize(sentences):
        return ids.copy(), mask.copy()

    kw = dict(prune_active=True, enc_token_id=58, print_fn=lambda *a: None)
    stats1, g1 = task.evaluate(params, lambda: iter(batches), tokenize, cfg,
                               1.0, **kw)
    mesh = make_mesh(n_data=8, n_model=1)
    stats2, g2 = task.evaluate(params, lambda: iter(batches), tokenize, cfg,
                               1.0, mesh=mesh, **kw)
    assert stats1["acc"] == stats2["acc"]
    assert abs(g1 - g2) < 1e-6


def test_nlvr_evaluate_mesh_pads_ragged_batch():
    """Eval batch NOT divisible by the data axis: padded by repeating the
    last sample (neutral for DTP batch-max coupling) and must still equal
    the single-device result exactly."""
    from madtp_tpu.core.config import MedConfig, ViTConfig
    from madtp_tpu.models.blip import BlipConfig
    from madtp_tpu.models.med import init_med_params
    from madtp_tpu.models.vit import init_vit_params
    from madtp_tpu.tasks import nlvr as task

    vit = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    med = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=32, encoder_width=32, sd_dim=32,
                    twin_cross=True)
    cfg = BlipConfig(vit=vit, med=med, sd_dim=32)
    rng = np.random.RandomState(3)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(vit, rng),
        "text_encoder": init_med_params(med, rng),
        "space_dict": rng.randn(8, 32).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": rng.randn(32, 32).astype(np.float32) * 0.02,
                    "bias": np.zeros(32, np.float32)},
            "fc2": {"kernel": rng.randn(32, 2).astype(np.float32) * 0.02,
                    "bias": np.zeros(2, np.float32)},
        },
    })
    B = 5  # not divisible by 8
    batches = [(rng.randn(B, 3, 32, 32).astype(np.float32),
                rng.randn(B, 3, 32, 32).astype(np.float32),
                ["x"] * B, rng.randint(0, 2, (B,)))]
    ids = rng.randint(1, 60, (B, 6)).astype(np.int32)
    mask = np.ones((B, 6), np.int32)

    def tokenize(sentences):
        n = len(sentences)
        return ids[:n].copy(), mask[:n].copy()

    kw = dict(prune_active=True, enc_token_id=58, print_fn=lambda *a: None)
    stats1, g1 = task.evaluate(params, lambda: iter(batches), tokenize, cfg,
                               1.0, **kw)
    mesh = make_mesh(n_data=8, n_model=1)
    stats2, g2 = task.evaluate(params, lambda: iter(batches), tokenize, cfg,
                               1.0, mesh=mesh, **kw)
    assert stats1["acc"] == stats2["acc"]
    assert abs(g1 - g2) < 1e-6


def _retrieval_fixture(rng):
    from madtp_tpu.core.config import MedConfig, ViTConfig
    from madtp_tpu.models.blip import BlipConfig
    from madtp_tpu.models.med import init_med_params
    from madtp_tpu.models.vit import init_vit_params

    vit = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    med = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=32, encoder_width=32, sd_dim=32)
    cfg = BlipConfig(vit=vit, med=med, sd_dim=32)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(vit, rng),
        "text_encoder": init_med_params(med, rng),
        "space_dict": rng.randn(8, 32).astype(np.float32),
        "vision_proj": {"kernel": rng.randn(32, 16).astype(np.float32) * 0.1,
                        "bias": np.zeros(16, np.float32)},
        "text_proj": {"kernel": rng.randn(32, 16).astype(np.float32) * 0.1,
                      "bias": np.zeros(16, np.float32)},
        "itm_head": {"kernel": rng.randn(32, 2).astype(np.float32) * 0.1,
                     "bias": np.zeros(2, np.float32)},
    })
    return cfg, params


def test_retrieval_train_step_sharded_matches_single_device():
    """VERDICT r1 item 4: the full ITC+ITM+queue train step on an 8-device
    'data' mesh must reproduce the single-device run of the same global batch
    — in particular the queue must contain the full cross-shard momentum
    batch (the reference's concat_all_gather + _dequeue_and_enqueue,
    models/blip_retrieval.py:172-173,334-345)."""
    from madtp_tpu.parallel.mesh import replicate, shard_batch_padded
    from madtp_tpu.train.loops import (
        MOMENTUM_KEYS, RetrievalTrainState, make_retrieval_train_step,
    )
    from madtp_tpu.train.momentum import init_queue
    from madtp_tpu.train.optim import make_adamw_injectable

    rng = np.random.RandomState(7)
    cfg, params = _retrieval_fixture(rng)
    B = 8
    images = rng.randn(B, 3, 32, 32).astype(np.float32)
    ids = rng.randint(1, 60, (B, 7)).astype(np.int32)
    mask = np.ones((B, 7), np.int32)
    idx = np.arange(B)

    def fresh_state():
        tx = make_adamw_injectable(0.05)
        return tx, RetrievalTrainState(
            params=params,
            params_m={k: params[k] for k in MOMENTUM_KEYS},
            opt_state=tx.init(params),
            queue=init_queue(16, 32),
            temp=jnp.float32(0.07),
        )

    key = jax.random.PRNGKey(0)
    tx1, state1 = fresh_state()
    step1 = make_retrieval_train_step(
        cfg, tx1, enc_token_id=58, negative_all_rank=True)
    state1, m1 = step1(state1, key, jnp.asarray(images), jnp.asarray(ids),
                       jnp.asarray(mask), jnp.asarray(idx), jnp.float32(1.0))

    mesh = make_mesh(n_data=8, n_model=1)
    tx2, state2 = fresh_state()
    state2 = replicate(mesh, state2)
    images_d, ids_d, mask_d, idx_d, _ = shard_batch_padded(
        mesh, images, ids, mask, idx)
    step2 = make_retrieval_train_step(
        cfg, tx2, enc_token_id=58, negative_all_rank=True, data_shards=8)
    state2, m2 = step2(state2, key, images_d, ids_d, mask_d, idx_d,
                       jnp.float32(1.0))

    # queue received the full global batch, identically
    np.testing.assert_allclose(np.asarray(state1.queue.image),
                               np.asarray(state2.queue.image),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state1.queue.text),
                               np.asarray(state2.queue.text),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state1.queue.idx),
                                  np.asarray(state2.queue.idx))
    for k, v in m1.items():
        np.testing.assert_allclose(float(v), float(m2[k]), rtol=2e-4,
                                   err_msg=k)
    # updated params identical too (XLA-inserted grad collectives == DDP)
    f1 = np.asarray(state1.params["vision_proj"]["kernel"])
    f2 = np.asarray(state2.params["vision_proj"]["kernel"])
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)


def test_hard_negative_group_locality():
    """negative_all_rank=False semantics: with group restriction the sampled
    negative must come from the query's own shard block even when every
    cross-block candidate is overwhelmingly more similar."""
    from madtp_tpu.train.losses import sample_hard_negatives

    B, E, shards = 8, 4, 4
    group = jnp.asarray(np.arange(B) * shards // B)  # [0,0,1,1,2,2,3,3]
    rng = np.random.RandomState(0)
    feat = rng.randn(B, E).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)  # like the real towers
    # make cross-group pairs maximally similar: identical feature per group-pair
    feat_b = np.roll(feat, B // shards, axis=0)  # best match is next block
    idx = jnp.arange(B)
    idx_world = jnp.arange(B) + 100  # no id collisions -> nothing id-masked

    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        neg_local = sample_hard_negatives(
            key, jnp.asarray(feat), jnp.asarray(feat_b), idx, idx_world,
            jnp.float32(0.05), group_a=group, group_b=group)
        picked_groups = np.asarray(group)[np.asarray(neg_local)]
        np.testing.assert_array_equal(picked_groups, np.asarray(group))

    # and without the restriction the sampler does reach other blocks
    neg_global = sample_hard_negatives(
        jax.random.PRNGKey(0), jnp.asarray(feat), jnp.asarray(feat_b), idx,
        idx_world, jnp.float32(0.05))
    assert (np.asarray(group)[np.asarray(neg_global)] != np.asarray(group)).any()


def test_tensor_parallel_med_attention_heads_match():
    """MED head-parallel TP (q/k/v kernels output-sharded over 'model' —
    contiguous D-chunks are whole heads since the head reshape is
    head-major; attention.output.dense closes the split input-sharded):
    a pruned multimodal forward with TP params must equal the replicated
    run, scoring signals and kept counts included."""
    from madtp_tpu.core.config import MedConfig
    from madtp_tpu.models.med import init_med_params, med_encoder

    med = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=128,
                    max_position_embeddings=32, encoder_width=32, sd_dim=32)
    rng = np.random.RandomState(3)
    params = jax.tree.map(jnp.asarray, init_med_params(med, rng))
    sd = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, (4, 12)).astype(np.int32))
    mask = jnp.ones((4, 12), jnp.int32)
    enc = jnp.asarray(rng.randn(4, 9, 32).astype(np.float32))
    enc_alive = jnp.ones((4, 9), jnp.float32)

    from madtp_tpu.prune.dtp import TokenState

    def fwd(params, ids, mask, enc, enc_alive, sd):
        out = med_encoder(params, ids, mask, med, mode="multimodal",
                          encoder_state=TokenState(enc, enc_alive, None),
                          space_dict=sd,
                          temperature=1.0, prune_active=True)
        return out.state.x, out.kept_counts

    ref_x, ref_kept = jax.jit(fwd)(params, ids, mask, enc, enc_alive, sd)

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        specs = model_parallel_param_shardings(mesh, params)
        p_tp = jax.tree_util.tree_map(jax.device_put, params, specs)
        rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        x, kept = jax.jit(fwd)(p_tp, rep(ids), rep(mask), rep(enc),
                               rep(enc_alive), rep(sd))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(ref_kept))
    # the q/k/v kernels really are head-sharded; the ViT fused qkv is not
    q = p_tp["layers"]["attention"]["self"]["query"]["kernel"]
    assert q.sharding.spec == P(None, None, "model")


def test_amp_nlvr_train_step_on_mesh_keeps_fp32_masters():
    """--amp composes with GSPMD: the bf16-compute NLVR train step sharded
    over 'data' reproduces the single-device amp run (XLA's inserted grad
    collectives operate on the fp32 gradients the cast's VJP returns), and
    the updated masters stay fp32 on the mesh."""
    import optax

    from madtp_tpu.core.config import MedConfig, ViTConfig
    from madtp_tpu.models.blip import BlipConfig
    from madtp_tpu.models.med import init_med_params
    from madtp_tpu.models.vit import init_vit_params
    from madtp_tpu.train.loops import make_nlvr_train_step

    vit = ViTConfig(image_size=32, patch_size=8, embed_dim=32, depth=2,
                    num_heads=4, sd_dim=32)
    med = MedConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=32, encoder_width=32, sd_dim=32,
                    twin_cross=True)
    cfg = BlipConfig(vit=vit, med=med, sd_dim=32)
    rng = np.random.RandomState(11)
    params = jax.tree.map(jnp.asarray, {
        "visual_encoder": init_vit_params(vit, rng),
        "text_encoder": init_med_params(med, rng),
        "space_dict": rng.randn(10, 32).astype(np.float32),
        "cls_head": {
            "fc1": {"kernel": rng.randn(32, 32).astype(np.float32) * 0.02,
                    "bias": np.zeros(32, np.float32)},
            "fc2": {"kernel": rng.randn(32, 2).astype(np.float32) * 0.02,
                    "bias": np.zeros(2, np.float32)},
        },
    })
    B = 8
    images = jnp.asarray(rng.randn(2 * B, 3, 32, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, (B, 8)))
    mask = jnp.ones((B, 8), jnp.int32)
    targets = jnp.asarray(rng.randint(0, 2, B))

    tx = optax.adamw(1e-4)
    step = make_nlvr_train_step(cfg, tx, amp=True)
    p1, _, m1 = step(jax.tree.map(jnp.copy, params), tx.init(params), images,
                     ids, mask, targets, jnp.float32(1.0))

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        # NLVR images stack the pair as [2B]: shard so each device gets its
        # samples' two images (the drivers interleave via the same spec)
        p_rep = jax.device_put(jax.tree.map(jnp.copy, params),
                               NamedSharding(mesh, P()))
        dspec = NamedSharding(mesh, P("data"))
        step2 = make_nlvr_train_step(cfg, tx, amp=True)
        p2, _, m2 = step2(p_rep, tx.init(p_rep), jax.device_put(images, dspec),
                          jax.device_put(ids, dspec),
                          jax.device_put(mask, dspec),
                          jax.device_put(targets, dspec), jnp.float32(1.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    for leaf in jax.tree_util.tree_leaves(p2):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(p1["cls_head"]["fc1"]["kernel"]),
        np.asarray(p2["cls_head"]["fc1"]["kernel"]), rtol=1e-4, atol=1e-5)
