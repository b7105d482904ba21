"""Export a compressed checkpoint as an AOT serving artifact.

The reference's only deployment mode is re-running its research stack
(``compress_*_dtp.py --evaluate`` re-imports torch+HF+timm and re-traces per
process).  This tool lowers the pruned eval step ONCE and writes a
self-contained ``jax.export`` artifact (see ``madtp_tpu/serve/artifact.py``)
that a serving process loads without any model code.

    python -m madtp_tpu.cli.export_serving --task nlvr \
        --pretrained ckpt.pth --config configs/nlvr.yaml \
        --batch 32 --output_dir artifacts/nlvr_p0.5

    python -m madtp_tpu.cli.export_serving --task clip \
        --pretrained clip.pth --config configs/retrieval_flickr_clip.yaml \
        --output_dir artifacts/clip   # -> clip/image_encoder + clip/text_encoder

All five task families export: ``nlvr`` (classification step), ``clip``
(dual towers), ``caption`` (pruned encode + jitted beam decode — the
lax.fori_loop search exports whole), ``vqa`` (rank: BOS shortlist +
shared-KV rerank; the answer list is a call-time input), ``retrieval``
(ITC towers + the stage-2 ITM rerank unit).

The DTP ``temperature`` is read from the checkpoint (the reference stores it
inside the ``.pth``, ``compress_nlvr_dtp.py:157``) and may be overridden with
``--temperature``.  Default semantics are the exact mask mode; ``--fast_eval``
exports the calibrated gather fast path (capacities from mask-mode probe
batches — synthetic images by default, or ``--probe_npz`` with a real batch
for production calibration; drift is quantified in
tests/test_calibration_drift.py).

``--row_independent`` (all five tasks) exports per-row batch-1 DTP
semantics: every row computes as if served alone (the batch-max keep-count
coupling of reference batched eval is traded away), which lets the HTTP
server merge different requests into one device call (dynamic batching —
serve/server.py gates merging on the recorded flag).  Caption and VQA are
per-row downstream of the towers by construction (beams attend only to
their own row's tokens; answer ranking tiles each question's memory), so
the flag covers them too; NLVR additionally decouples the two images of a
pair (recorded in meta).  Gather-mode row-independent kept counts report
the per-row DECISION, so the server can surface capacity overflow in
/stats (meta batching.kept_outputs).
"""

from __future__ import annotations

import os

import numpy as np


def _probe_images(args, shape):
    """Probe batch for --fast_eval capacity calibration.  The npz's FIRST
    array is the images; it must supply at least ``shape[0]`` of them (for
    NLVR that is 2*batch — the driver concatenates the image pair on the
    batch dim, reference compress_nlvr_dtp.py:43)."""
    if args.probe_npz:
        with np.load(args.probe_npz) as z:
            imgs = z[z.files[0]].astype(np.float32)
        if imgs.shape[1:] != shape[1:]:
            raise SystemExit(
                f"--probe_npz images {imgs.shape} do not match the export "
                f"shape {shape}")
        if imgs.shape[0] < shape[0]:
            raise SystemExit(
                f"--probe_npz supplies {imgs.shape[0]} images but the export "
                f"needs {shape[0]} (NLVR needs 2*batch: the image pair is "
                f"concatenated on the batch dim)")
        return imgs[: shape[0]]
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def _probe_text(args, batch, text_len, tokenize=None):
    """Probe text for --fast_eval TEXT capacity calibration.

    Gather mode silently truncates to the calibrated static capacity, so
    calibrating on degenerate all-zero-id 'sentences' risks silent served
    accuracy drift.  Accepts ``ids``/``mask`` arrays in the --probe_npz, or
    a --probe_sentences file (one sentence per line) tokenized with the
    task tokenizer; otherwise falls back to zeros with a LOUD warning."""
    if args.probe_npz:
        with np.load(args.probe_npz) as z:
            if "ids" in z.files and "mask" in z.files:
                ids = z["ids"].astype(np.int32)
                mask = z["mask"].astype(np.int32)
                if ids.shape[0] < batch or ids.shape[1] != text_len:
                    raise SystemExit(
                        f"--probe_npz ids {ids.shape} do not cover the export "
                        f"text shape ({batch}, {text_len})")
                return ids[:batch], mask[:batch]
    if args.probe_sentences:
        if tokenize is None:
            raise SystemExit("--probe_sentences needs a task tokenizer")
        with open(args.probe_sentences) as f:
            sents = [line.strip() for line in f if line.strip()]
        if len(sents) < batch:
            raise SystemExit(
                f"--probe_sentences supplies {len(sents)} sentences but the "
                f"export batch is {batch}")
        ids, mask = tokenize(sents[:batch])
        return np.asarray(ids, np.int32), np.asarray(mask, np.int32)
    print("WARNING: --fast_eval text capacities calibrated on all-zero-id "
          "probe text (no ids/mask in --probe_npz, no --probe_sentences); "
          "served text pruning may truncate real sentences — supply real "
          "probe text for production calibration")
    return (np.zeros((batch, text_len), np.int32),
            np.ones((batch, text_len), np.int32))


def _mark_row_independent(meta, outputs, kept_outputs=None, note=""):
    """--row_independent bookkeeping: per-row outputs mults + the flag the
    serving dispatcher gates dynamic-batch merging on (serve/server.py).

    ``kept_outputs`` maps output index -> "vision"|"text": which capacity
    schedule (meta["capacities_*"]) that kept-counts output is calibrated
    against.  Row-independent gather kept counts report the per-row DTP
    DECISION (prune/dtp.dtp_prune_gather docstring), so the server derives
    overflow = max(0, kept - (cap - 1)) per layer and surfaces it in
    /stats — a mis-calibrated schedule is observable, never silent.

    The per-row semantics themselves are NATIVE: the model fns take
    ``row_independent=True`` (prune/dtp.py) — each row keeps its OWN
    threshold count instead of the batch max, so a row's output never
    depends on its co-tenants, while the fused Pallas scoring kernel stays
    engaged (the batch coupling lives in the DTP glue, not the kernel).
    An earlier vmap-based implementation lost the kernel (Mosaic cannot
    lower the squeezed-batch BlockSpecs vmap produces for pallas_call;
    measured 1.9x slower, tools/bench_rowind.py) — the native flag keeps
    full batched-path speed."""
    bat = dict(meta["batching"])
    bat["outputs"] = list(outputs)
    bat["row_independent"] = True
    if kept_outputs:
        bat["kept_outputs"] = {str(k): v for k, v in kept_outputs.items()}
    tag = " [row-independent: per-row DTP decisions" + note + "]"
    return {**meta, "batching": bat,
            "outputs": meta.get("outputs", "") + tag}


def _param_subtree(params, *keys):
    """The top-level param entries one exported unit actually reads.

    Multi-unit exports (retrieval: 3 artifacts, CLIP: 2) are served by ONE
    process, so shipping the full tree per unit would multiply disk, the
    host->device weight upload and HBM residency by the unit count; a
    missing key fails loudly at trace time inside save_artifact, so the
    lists cannot silently go stale (the roundtrip tests call every unit)."""
    return {k: params[k] for k in keys if k in params}


def _export_nlvr(args, config, platforms):
    import jax.numpy as jnp

    from madtp_tpu.cli.common import build_blip_cfg, fast_capacity_schedule
    from madtp_tpu.models.blip import blip_nlvr_forward, load_blip_nlvr
    from madtp_tpu.serve import save_artifact
    from madtp_tpu.tasks.nlvr import make_eval_step

    image_size = config.get("image_size", 384)
    cfg = build_blip_cfg(config, image_size, twin_cross=True)
    if args.pretrained:
        params, temperature = load_blip_nlvr(args.pretrained, cfg)
    else:  # synthetic weights (artifact-pipeline smoke / shape validation)
        from madtp_tpu.cli.common import init_blip_params

        params = init_blip_params(cfg, seed=0)
        temperature = 1.0
    if args.temperature is not None:
        temperature = args.temperature
    prune = temperature > 0

    B, T = args.batch, args.text_len
    images = jnp.zeros((2 * B, 3, image_size, image_size), jnp.float32)
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    t = jnp.float32(temperature)

    caps_v = caps_t = None
    if args.fast_eval and prune:
        import jax

        probe = jnp.asarray(_probe_images(args, images.shape))
        # real probe TEXT matters as much as real probe images: the drivers
        # calibrate from real tokenized sentences (compress_nlvr.py:216-226)
        tokenize = None
        if args.probe_sentences:
            from madtp_tpu.data.tokenizer_bert import BertWordPieceTokenizer

            if not args.bert_vocab:
                raise SystemExit("--probe_sentences needs --bert_vocab")
            tokzr = BertWordPieceTokenizer(args.bert_vocab)

            def tokenize(sents):
                out = tokzr(sents, padding="max_length", max_length=T)
                ids = np.asarray(out["input_ids"], np.int32)
                ids[:, 0] = tokzr.enc_token_id  # reference blip_nlvr.py:69
                return ids, np.asarray(out["attention_mask"], np.int32)

        p_ids, p_mask = _probe_text(args, B, T, tokenize)
        p_ids, p_mask = jnp.asarray(p_ids), jnp.asarray(p_mask)
        step = make_eval_step(cfg, True)
        _, vk, tk = jax.block_until_ready(step(params, probe, p_ids, p_mask, t))
        caps_v, caps_t = fast_capacity_schedule(
            np.asarray(vk), np.asarray(tk), args.cap_mode)
        fn = make_eval_step(cfg, True, tuple(caps_v), tuple(caps_t),
                            row_independent=args.row_independent)
    else:
        def fn(params, images, ids, mask, t):
            logits, (vk, tk) = blip_nlvr_forward(
                params, images, ids, mask, cfg,
                temperature=t, prune_active=prune,
                row_independent=args.row_independent)
            return logits, vk, tk

    meta = {
        "task": "nlvr",
        "temperature": float(temperature),
        "mode": "gather" if caps_v is not None else
                ("mask" if prune else "dense"),
        "capacities_vision": None if caps_v is None else list(caps_v),
        "capacities_text": None if caps_t is None else list(caps_t),
        "outputs": "(logits [B,2], vision_kept, text_kept)",
        # sub-batch serving (serve/server.py): images stack the pair as
        # TWO n-row blocks (reference compress_nlvr_dtp.py:43)
        "batching": {"batch": B, "inputs": [2, 1, 1, 0],
                     "outputs": [1, 0, 0]},
    }
    if args.row_independent:
        base_fn = fn

        def fn(params, images, ids, mask, t):
            logits, vk, tk = base_fn(params, images, ids, mask, t)
            # per-row kept counts, batch-leading for the slicing spec:
            # vision [L, 2B] -> [2B, L] (two pair blocks), text -> [B, L]
            return logits, vk.T, tk.T

        # ADVICE r4: the NLVR pair decouples too — the vision tower runs on
        # the [2B] image stack, so each image of a pair prunes on its OWN
        # counts; a batch-1 call on a batch-coupled artifact still couples
        # the pair through the batch max.  Recorded for artifact consumers
        # (models/blip.py:84-96 docstring + MIGRATION.md).
        meta = _mark_row_independent(
            meta, [1, 2, 1], kept_outputs={1: "vision", 2: "text"},
            note="; NLVR pair images also prune independently of each "
                 "other — scores can differ slightly from batched/"
                 "reference eval")
    save_artifact(args.output_dir, fn, params, (images, ids, mask, t),
                  meta=meta, platforms=platforms)
    print(f"exported NLVR serving artifact -> {args.output_dir} "
          f"(T={temperature}, mode="
          f"{'gather' if caps_v is not None else 'mask' if prune else 'dense'})")


def _export_clip(args, config, platforms):
    import jax.numpy as jnp

    from madtp_tpu.cli.common import fast_capacity_schedule
    from madtp_tpu.models.clip import clip_encode_image, clip_encode_text
    from madtp_tpu.serve import save_artifact

    if args.pretrained:
        import jax

        from madtp_tpu.ckpt import load_state_dict, remap_clip
        from madtp_tpu.cli.compress_retrieval_clip import infer_clip_config

        sd, extras = load_state_dict(args.pretrained)
        cfg = infer_clip_config(sd, sd_dim=config.get("sd_dim", 768))
        params = jax.tree.map(jnp.asarray, remap_clip(sd))
        # remap_clip returns a fixed tower tree WITHOUT space_dict; a
        # compressed CLIP .pth stores it in the raw sd (the driver reads it
        # there too, compress_retrieval_clip.py:129) — dropping it would
        # export an artifact that prunes without the MAG term
        if "space_dict" in sd:
            params["space_dict"] = jnp.asarray(
                np.asarray(sd["space_dict"], np.float32))
        temperature = float(extras.get("temperature", 0.0))
    else:
        from madtp_tpu.core.config import CLIPConfig
        from madtp_tpu.models.clip import init_clip_params

        cfg = CLIPConfig(image_resolution=config.get("image_size", 224))
        rng0 = np.random.RandomState(0)
        params = init_clip_params(cfg, rng0)
        params["space_dict"] = rng0.randn(
            config.get("sd_num", 100), cfg.sd_dim).astype(np.float32)
        import jax

        params = jax.tree.map(jnp.asarray, params)
        temperature = 1.0
    if args.temperature is not None:
        temperature = args.temperature
    prune = temperature > 0
    sd_key = "space_dict" if "space_dict" in params else None

    B = args.batch
    images = jnp.zeros((B, 3, cfg.image_resolution, cfg.image_resolution),
                       jnp.float32)
    text = jnp.zeros((B, cfg.context_length), jnp.int32)
    t = jnp.float32(temperature)

    caps_v = None
    if args.fast_eval and prune and not cfg.is_resnet:
        import jax

        probe = jnp.asarray(_probe_images(args, images.shape))
        _, _, vk = jax.block_until_ready(jax.jit(
            lambda p, im, t: clip_encode_image(
                p, im, cfg, space_dict=p.get(sd_key) if sd_key else None,
                temperature=t, prune_active=True))(params, probe, t))
        caps_v, _ = fast_capacity_schedule(np.asarray(vk), None, args.cap_mode)
        caps_v = tuple(caps_v)

    ri = args.row_independent

    def img_fn(params, images, t):
        feats, _, kept = clip_encode_image(
            params, images, cfg,
            space_dict=params.get(sd_key) if sd_key else None,
            temperature=t, prune_active=prune and not cfg.is_resnet,
            capacities=caps_v, row_independent=ri)
        return (feats, kept.T) if ri else (feats, kept)

    def txt_fn(params, text, t):
        feats, _, kept = clip_encode_text(
            params, text, cfg,
            space_dict=params.get(sd_key) if sd_key else None,
            temperature=t, prune_active=prune, row_independent=ri)
        return (feats, kept.T) if ri else (feats, kept)

    meta = {"temperature": float(temperature),
            "mode": "gather" if caps_v is not None else
                    ("mask" if prune else "dense"),
            "capacities_vision": None if caps_v is None else list(caps_v)}
    # per-unit param subtrees: one server hosts both towers, so each
    # artifact ships only the weights its fn reads (see _export_retrieval)
    img_meta = {
        "task": "clip_image",
        "outputs": "(features [B,E], kept_counts)",
        "batching": {"batch": B, "inputs": [1, 0], "outputs": [1, 0]},
        **meta}
    txt_meta = {
        "task": "clip_text",
        "outputs": "(features [B,E], kept_counts)",
        "batching": {"batch": B, "inputs": [1, 0], "outputs": [1, 0]},
        **meta}
    if ri:
        # RN towers run unpruned and return an EMPTY kept array — it stays
        # an unbatched output (mult 0)
        img_meta = _mark_row_independent(
            img_meta, [1, 0 if cfg.is_resnet else 1],
            kept_outputs=None if cfg.is_resnet else {1: "vision"})
        txt_meta = _mark_row_independent(txt_meta, [1, 1],
                                         kept_outputs={1: "text"})
    save_artifact(os.path.join(args.output_dir, "image_encoder"),
                  img_fn,
                  _param_subtree(params, "visual", "space_dict"),
                  (images, t), meta=img_meta, platforms=platforms)
    save_artifact(os.path.join(args.output_dir, "text_encoder"),
                  txt_fn,
                  _param_subtree(params, "token_embedding",
                                 "positional_embedding", "blocks",
                                 "ln_final", "text_projection", "space_dict"),
                  (text, t), meta=txt_meta, platforms=platforms)
    print(f"exported CLIP serving artifacts -> {args.output_dir}"
          f"/{{image_encoder,text_encoder}} (T={temperature})")


from madtp_tpu.cli.common import codegen_crash_autofallback


@codegen_crash_autofallback
def _export_caption(args, config, platforms):
    """Caption beam decode artifact: pruned image encode + the fully-jitted
    static-shape beam search (tasks/caption.beam_generate — one lax.fori_loop,
    the exportable counterpart of the reference's host-side HF generate,
    models/blip.py:161-202).  The bos-prefixed prompt ids are a CALL-TIME
    input (serve-side tokenizes the prompt once); beam hyperparameters are
    baked and recorded in meta."""
    import jax.numpy as jnp

    from madtp_tpu.cli.common import build_blip_cfg, fast_capacity_schedule
    from madtp_tpu.models.blip import blip_caption_encode_image, load_blip_caption
    from madtp_tpu.serve import save_artifact
    from madtp_tpu.tasks.caption import beam_generate

    image_size = config.get("image_size", 384)
    cfg = build_blip_cfg(config, image_size)
    if args.pretrained:
        params, temperature = load_blip_caption(args.pretrained, cfg)
        import jax

        params = jax.tree.map(jnp.asarray, params)
    else:
        from madtp_tpu.cli.common import init_blip_params

        params = init_blip_params(cfg, 0, heads=(), with_encoder=False,
                                  with_decoder=True)
        temperature = 1.0
    if args.temperature is not None:
        temperature = args.temperature
    prune = temperature > 0

    B = args.batch
    images = jnp.zeros((B, 3, image_size, image_size), jnp.float32)
    prompt_ids = jnp.zeros((B, args.prompt_len), jnp.int32)
    t = jnp.float32(temperature)

    caps_v = None
    if args.fast_eval and prune:
        import jax

        probe = jnp.asarray(_probe_images(args, images.shape))
        _, _, vk = jax.block_until_ready(jax.jit(
            lambda p, im, t: blip_caption_encode_image(
                p, im, cfg, temperature=t, prune_active=True))(
                    params, probe, t))
        caps_v, _ = fast_capacity_schedule(np.asarray(vk), None, args.cap_mode)
        caps_v = tuple(caps_v)

    ri = args.row_independent

    def fn(params, images, prompt_ids, t):
        vstate, _, vkept = blip_caption_encode_image(
            params, images, cfg, temperature=t, prune_active=prune,
            capacities=caps_v, row_independent=ri)
        seqs = beam_generate(
            params["text_decoder"], vstate, prompt_ids, cfg,
            num_beams=args.num_beams, max_length=args.max_length,
            min_length=args.min_length, eos_token_id=args.eos_id,
            pad_token_id=args.pad_id)
        # row_independent: per-row kept counts, batch-leading [B, L]
        return seqs, (vkept.T if ri else vkept)

    meta = {
        "task": "caption",
        "temperature": float(temperature),
        "mode": "gather" if caps_v is not None else
                ("mask" if prune else "dense"),
        "capacities_vision": None if caps_v is None else list(caps_v),
        "num_beams": args.num_beams, "max_length": args.max_length,
        "min_length": args.min_length, "eos_id": args.eos_id,
        "pad_id": args.pad_id,
        "outputs": "(sequences [B,max_length] incl. prompt, vision_kept)",
        "batching": {"batch": B, "inputs": [1, 1, 0],
                     "outputs": [1, 0]},
    }
    if ri:
        # sound per-row semantics: DTP runs only on the image tokens, and
        # the beam search is per-row by construction (each row's beams
        # attend only to that row's token state — tasks/caption.py)
        meta = _mark_row_independent(meta, [1, 1],
                                     kept_outputs={1: "vision"})
    save_artifact(
        args.output_dir, fn, params, (images, prompt_ids, t),
        meta=meta,
        platforms=platforms,
    )
    print(f"exported caption serving artifact -> {args.output_dir} "
          f"(T={temperature}, beams={args.num_beams})")


def _export_vqa(args, config, platforms):
    """VQA answer-ranking artifact (reference rank_answer,
    models/blip_vqa.py:156-203): pruned image+question encode, BOS-step
    shortlist, shared-KV candidate rerank.  The tokenized answer list is a
    CALL-TIME input pinned to [num_answers, answer_len] — swap answer lists
    without re-exporting."""
    import jax.numpy as jnp

    from madtp_tpu.cli.common import build_blip_cfg, fast_capacity_schedule
    from madtp_tpu.models.blip import blip_vqa_encode, load_blip_vqa
    from madtp_tpu.serve import save_artifact
    from madtp_tpu.tasks.vqa import rank_answers

    image_size = config.get("image_size", 480)
    cfg = build_blip_cfg(config, image_size)
    if args.pretrained:
        import jax

        params, temperature = load_blip_vqa(args.pretrained, cfg)
        params = jax.tree.map(jnp.asarray, params)
    else:
        from madtp_tpu.cli.common import init_blip_params

        params = init_blip_params(cfg, 0, heads=(), with_decoder=True)
        temperature = 1.0
    if args.temperature is not None:
        temperature = args.temperature
    prune = temperature > 0

    B, T = args.batch, args.text_len
    nA, La = args.num_answers, args.answer_len
    k = min(args.k_test, nA)
    images = jnp.zeros((B, 3, image_size, image_size), jnp.float32)
    q_ids = jnp.zeros((B, T), jnp.int32)
    q_mask = jnp.ones((B, T), jnp.int32)
    a_ids = jnp.zeros((nA, La), jnp.int32)
    a_mask = jnp.ones((nA, La), jnp.int32)
    t = jnp.float32(temperature)

    caps_v = caps_t = None
    if args.fast_eval and prune:
        import jax

        probe = jnp.asarray(_probe_images(args, images.shape))
        p_ids, p_mask = _probe_text(args, B, T)
        out, _, vk = jax.block_until_ready(jax.jit(
            lambda p, im, qi, qm, t: blip_vqa_encode(
                p, im, qi, qm, cfg, temperature=t, prune_active=True))(
                    params, probe, jnp.asarray(p_ids), jnp.asarray(p_mask),
                    t))
        caps_v, caps_t = fast_capacity_schedule(
            np.asarray(vk), np.asarray(out.kept_counts), args.cap_mode)

    ri = args.row_independent

    def fn(params, images, q_ids, q_mask, a_ids, a_mask, t):
        out, _, vkept = blip_vqa_encode(
            params, images, q_ids, q_mask, cfg,
            temperature=t, prune_active=prune,
            capacities_v=caps_v, capacities_t=caps_t, row_independent=ri)
        best, topk = rank_answers(
            params["text_decoder"], out.state, a_ids, a_mask, cfg,
            k=k, pad_token_id=args.pad_id)
        if ri:  # per-row kept counts, batch-leading [B, L]
            return best, topk, vkept.T, out.kept_counts.T
        return best, topk, vkept, out.kept_counts

    meta = {
        "task": "vqa_rank",
        "temperature": float(temperature),
        "mode": "gather" if caps_v is not None else
                ("mask" if prune else "dense"),
        "capacities_vision": None if caps_v is None else list(caps_v),
        "capacities_text": None if caps_t is None else list(caps_t),
        "k_test": k,
        "outputs": "(best answer index [B], topk candidate ids [B,k], "
                   "vision_kept, text_kept)",
        # the answer list is NOT batched (inputs 3/4)
        "batching": {"batch": B, "inputs": [1, 1, 1, 0, 0, 0],
                     "outputs": [1, 1, 0, 0]},
    }
    if ri:
        # sound per-row semantics: both towers take the native per-row DTP
        # flag, and rank_answers tiles each question's memory independently
        # (tasks/vqa.py) — requests merge only when their answer lists (the
        # unbatched inputs) are equal, enforced by the dispatcher
        meta = _mark_row_independent(
            meta, [1, 1, 1, 1], kept_outputs={2: "vision", 3: "text"})
    save_artifact(
        args.output_dir, fn, params, (images, q_ids, q_mask, a_ids, a_mask, t),
        meta=meta,
        platforms=platforms,
    )
    print(f"exported VQA rank serving artifact -> {args.output_dir} "
          f"(T={temperature}, k={k}, answers={nA}x{La})")


def _export_retrieval(args, config, platforms):
    """BLIP retrieval serving artifacts: ``image_encoder`` (ITC feature +
    the pruned TokenState the rerank consumes), ``text_encoder`` (ITC
    feature), and ``itm_rerank`` (the stage-2 scorer,
    reference compress_retrieval_dtp.py:157-205 — each row pairs text i
    with image-state i; the server gathers each query's top-k candidates
    into rows).  The rerank input shapes are derived from the image
    encoder's traced output so the two artifacts always agree."""
    import jax
    import jax.numpy as jnp

    from madtp_tpu.cli.common import build_blip_cfg, fast_capacity_schedule
    from madtp_tpu.models.blip import (blip_itm_score,
                                       blip_retrieval_image_features,
                                       blip_retrieval_text_features,
                                       load_blip_retrieval)
    from madtp_tpu.serve import save_artifact

    image_size = config.get("image_size", 384)
    cfg = build_blip_cfg(config, image_size)
    if args.pretrained:
        params, temperature = load_blip_retrieval(args.pretrained, cfg)
        params = jax.tree.map(jnp.asarray, params)
    else:
        from madtp_tpu.cli.common import init_blip_params

        params = init_blip_params(cfg, 0, heads=("retrieval",))
        temperature = 1.0
    if args.temperature is not None:
        temperature = args.temperature
    prune = temperature > 0

    B, T = args.batch, args.text_len
    images = jnp.zeros((B, 3, image_size, image_size), jnp.float32)
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    t = jnp.float32(temperature)

    caps_v = caps_t = None
    if args.fast_eval and prune:
        from madtp_tpu.models import med as M
        from madtp_tpu.models.vit import vit_forward

        probe = jnp.asarray(_probe_images(args, images.shape))
        p_ids, p_mask = _probe_text(args, B, T)
        p_ids, p_mask = jnp.asarray(p_ids), jnp.asarray(p_mask)

        @jax.jit
        def probe_fn(params, images, ids, mask, t):
            # text AND multimodal keep counts (the ITM pass under image
            # conditioning prunes differently from text mode — the max
            # covers both, same policy as the retrieval driver's
            # _make_ft_probe)
            vstate, _, vk = vit_forward(
                params["visual_encoder"], images, cfg=cfg.vit,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            out_txt = M.med_encoder(
                params["text_encoder"], ids, mask, cfg.med, mode="text",
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            out_mm = M.med_encoder(
                params["text_encoder"], ids, mask, cfg.med,
                mode="multimodal", encoder_state=vstate,
                space_dict=params["space_dict"], temperature=t,
                prune_active=True)
            return vk, jnp.maximum(out_txt.kept_counts, out_mm.kept_counts)

        vk, tk = jax.block_until_ready(probe_fn(params, probe, p_ids,
                                                p_mask, t))
        caps_v, caps_t = fast_capacity_schedule(
            np.asarray(vk), np.asarray(tk), args.cap_mode)

    ri = args.row_independent

    def img_fn(params, images, t):
        feat, state, _ = blip_retrieval_image_features(
            params, images, cfg, temperature=t, prune_active=prune,
            capacities=caps_v, row_independent=ri)
        return feat, state.x, state.alive

    def txt_fn(params, ids, mask, t):
        feat, out = blip_retrieval_text_features(
            params, ids, mask, cfg, temperature=t, prune_active=prune,
            capacities=caps_t, row_independent=ri)
        return feat, (out.kept_counts.T if ri else out.kept_counts)

    from madtp_tpu.prune.dtp import TokenState

    # rerank row shapes come from the image encoder's TRACED output so the
    # two artifacts can never disagree on the token-buffer dim
    _, sx_s, sa_s = jax.eval_shape(img_fn, params, images, t)
    n = args.rerank_batch
    sx = jnp.zeros((n,) + sx_s.shape[1:], sx_s.dtype)
    sa = jnp.zeros((n,) + sa_s.shape[1:], sa_s.dtype)
    r_ids = jnp.zeros((n, T), jnp.int32)
    r_mask = jnp.ones((n, T), jnp.int32)

    def rerank_fn(params, ids, mask, sx, sa, t):
        return blip_itm_score(
            params, ids, mask, TokenState(sx, sa, None), cfg,
            temperature=t, prune_active=prune, capacities=caps_t,
            row_independent=ri)

    meta = {"temperature": float(temperature),
            "mode": "gather" if caps_v is not None else
                    ("mask" if prune else "dense"),
            "capacities_vision": None if caps_v is None else list(caps_v),
            "capacities_text": None if caps_t is None else list(caps_t)}
    # each unit ships ONLY the param subtree its fn reads — one server
    # hosts all three, so a shared full tree would triple weights.npz on
    # disk, the host->device upload (the serving bottleneck over slow
    # links, serve/artifact.py) and the HBM residency
    img_meta = {
        "task": "retrieval_image",
        "outputs": "(itc feature [B,E], state_x, state_alive)",
        "batching": {"batch": B, "inputs": [1, 0], "outputs": [1, 1, 1]},
        **meta}
    txt_meta = {
        "task": "retrieval_text",
        "outputs": "(itc feature [B,E], kept_counts)",
        "batching": {"batch": B, "inputs": [1, 1, 0], "outputs": [1, 0]},
        **meta}
    rr_meta = {
        "task": "retrieval_itm_rerank",
        "outputs": "itm match scores [n] (row i = text i vs "
                   "image-state i; add the ITC sim like the "
                   "reference, compress_retrieval_dtp.py:178)",
        "batching": {"batch": n, "inputs": [1, 1, 1, 1, 0],
                     "outputs": [1]},
        **meta}
    if ri:
        img_meta = _mark_row_independent(img_meta, [1, 1, 1])
        txt_meta = _mark_row_independent(txt_meta, [1, 1],
                                         kept_outputs={1: "text"})
        rr_meta = _mark_row_independent(rr_meta, [1])
    save_artifact(os.path.join(args.output_dir, "image_encoder"),
                  img_fn,
                  _param_subtree(params, "visual_encoder", "space_dict",
                                 "vision_proj"),
                  (images, t), meta=img_meta, platforms=platforms)
    save_artifact(os.path.join(args.output_dir, "text_encoder"),
                  txt_fn,
                  _param_subtree(params, "text_encoder", "space_dict",
                                 "text_proj"),
                  (ids, mask, t), meta=txt_meta, platforms=platforms)
    save_artifact(os.path.join(args.output_dir, "itm_rerank"),
                  rerank_fn,
                  _param_subtree(params, "text_encoder", "space_dict",
                                 "itm_head"),
                  (r_ids, r_mask, sx, sa, t),
                  meta=rr_meta, platforms=platforms)
    print(f"exported retrieval serving artifacts -> {args.output_dir}"
          f"/{{image_encoder,text_encoder,itm_rerank}} (T={temperature})")


def main():
    import argparse

    from madtp_tpu.cli.common import enable_compile_cache, load_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   choices=["nlvr", "clip", "caption", "vqa", "retrieval"])
    p.add_argument("--config", default="")
    p.add_argument("--pretrained", default="")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch", default=32, type=int,
                   help="served batch size (static)")
    p.add_argument("--text_len", default=26, type=int,
                   help="served text length (static; nlvr/vqa questions/"
                        "retrieval captions — reference pads to <=35)")
    # caption beam decode (reference models/blip.py:161-202 defaults)
    p.add_argument("--prompt_len", default=4, type=int,
                   help="caption: bos-prefixed prompt token count "
                        "('[DEC] a picture of' = 4)")
    p.add_argument("--num_beams", default=3, type=int)
    p.add_argument("--max_length", default=20, type=int)
    p.add_argument("--min_length", default=5, type=int)
    p.add_argument("--eos_id", default=102, type=int,
                   help="EOS token id (BERT [SEP]=102)")
    p.add_argument("--pad_id", default=0, type=int)
    # vqa rank (reference models/blip_vqa.py:156-203, k=128)
    p.add_argument("--num_answers", default=3128, type=int,
                   help="vqa: answer-list rows the artifact accepts (static)")
    p.add_argument("--answer_len", default=10, type=int,
                   help="vqa: tokenized answer length (static)")
    p.add_argument("--k_test", default=128, type=int,
                   help="vqa: rerank shortlist size")
    p.add_argument("--rerank_batch", default=128, type=int,
                   help="retrieval: rows per itm_rerank call (one query's "
                        "k_test candidates = one call at the reference's "
                        "k_test=128)")
    p.add_argument("--temperature", default=None, type=float,
                   help="override the checkpoint's stored DTP temperature")
    p.add_argument("--fast_eval", action="store_true",
                   help="export the calibrated gather fast path")
    p.add_argument("--cap_mode", default="ceil", choices=["ceil", "nearest"])
    p.add_argument("--probe_npz", default="",
                   help="npz for --fast_eval capacity calibration: first "
                        "array = real images (>=batch; NLVR needs 2*batch — "
                        "the image pair concatenates on the batch dim); "
                        "optional 'ids'/'mask' int arrays = real probe text")
    p.add_argument("--probe_sentences", default="",
                   help="text file (one sentence per line, >=batch) for "
                        "--fast_eval TEXT capacity calibration (nlvr)")
    p.add_argument("--bert_vocab", default="",
                   help="BERT vocab.txt for --probe_sentences tokenization")
    p.add_argument("--row_independent", action="store_true",
                   help="export per-row (batch-1) DTP "
                        "semantics — every row computes as if served alone, "
                        "so the HTTP server may merge different requests "
                        "into one device call (dynamic batching; "
                        "serve/server.py).  Batched evals couple rows via "
                        "the batch-max keep count (reference semantics); "
                        "this trades that coupling away.  The vmapped trace "
                        "takes the pure-XLA scoring path (Mosaic cannot "
                        "lower vmapped pallas_call blocks).  Measured cost "
                        "(tools/bench_rowind.py, batch-8 mask mode): 1.01x "
                        "vs the XLA batched step — row independence itself "
                        "is free — but 1.9x vs the fused-kernel batched "
                        "path; worth it under many small concurrent "
                        "requests, not for full-batch clients.")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms (e.g. 'tpu,cpu'; "
                        "default: current backend)")
    args = p.parse_args()

    enable_compile_cache()
    config = {}
    if args.config:
        class _A:  # load_config wants an argparse-like namespace
            pass

        a = _A()
        a.config = args.config
        a.synthetic = False
        a.p = 0.5
        a.pretrained = args.pretrained
        a.epoch = 0
        a.batch_size_train = a.batch_size_test = 0
        config = load_config(a)
    platforms = [s for s in args.platforms.split(",") if s] or None

    {"nlvr": _export_nlvr, "clip": _export_clip, "caption": _export_caption,
     "vqa": _export_vqa, "retrieval": _export_retrieval}[args.task](
        args, config, platforms)


if __name__ == "__main__":
    main()
