"""BLIP image-text retrieval compression / evaluation driver
(reference ``compress_retrieval_dtp.py`` / ``compress_retrieval_flickr_dtp.py``
— the two differ only in config; here one driver takes either yaml).

    python -m madtp_tpu.cli.compress_retrieval --config configs/retrieval_coco.yaml \
        --evaluate --pretrained ...
    python -m madtp_tpu.cli.compress_retrieval --config configs/retrieval_flickr.yaml ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from madtp_tpu.cli.common import (
    base_parser, dump_log, enable_compile_cache, load_config, make_tokenizer,
    set_seed,
)
from madtp_tpu.core.config import MedConfig, ViTConfig
from madtp_tpu.eval.metrics import itm_eval
from madtp_tpu.models.blip import BlipConfig, load_blip_retrieval
from madtp_tpu.tasks.retrieval import encode_corpus, rerank_scores

ORI_GFLOPS = 153.2  # reference compress_retrieval_dtp.py:383


def main():
    args = base_parser("configs/retrieval_coco.yaml").parse_args()
    config = load_config(args)
    set_seed(args.seed)
    enable_compile_cache()
    os.makedirs(args.output_dir, exist_ok=True)

    image_size = config.get("image_size", 64 if args.synthetic else 384)
    tokenizer = make_tokenizer(args, config)
    k_test = config.get("k_test", 4 if args.synthetic else 256)

    if args.synthetic:
        from madtp_tpu.models.med import init_med_params
        from madtp_tpu.models.vit import init_vit_params

        vit = ViTConfig(image_size=image_size, patch_size=16, embed_dim=64,
                        depth=2, num_heads=4, sd_dim=64)
        med = MedConfig(vocab_size=len(tokenizer.vocab), hidden_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=256, max_position_embeddings=64,
                        encoder_width=64, sd_dim=64)
        cfg = BlipConfig(vit=vit, med=med, sd_dim=64)
        rng = np.random.RandomState(0)
        params = jax.tree.map(jnp.asarray, {
            "visual_encoder": init_vit_params(vit, rng),
            "text_encoder": init_med_params(med, rng),
            "space_dict": rng.randn(10, 64).astype(np.float32),
            "vision_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                            "bias": np.zeros(16, np.float32)},
            "text_proj": {"kernel": rng.randn(64, 16).astype(np.float32) * 0.1,
                          "bias": np.zeros(16, np.float32)},
            "itm_head": {"kernel": rng.randn(64, 2).astype(np.float32) * 0.1,
                         "bias": np.zeros(2, np.float32)},
        })
        temperature = 1.0
        n_img = 6
        rng2 = np.random.RandomState(1)
        image_batches = [rng2.randn(3, 3, image_size, image_size).astype(np.float32)
                         for _ in range(2)]
        texts = [f"a picture of w{i}" for i in range(n_img)]
        txt2img = {i: i for i in range(n_img)}
        img2txt = {i: [i] for i in range(n_img)}
    else:
        vit = ViTConfig(image_size=image_size)
        med = MedConfig(encoder_width=vit.embed_dim)
        cfg = BlipConfig(vit=vit, med=med)
        params, temperature = load_blip_retrieval(config["pretrained"], cfg)
        params = jax.tree.map(jnp.asarray, params)

        from madtp_tpu.data.datasets import RetrievalEvalDataset
        from madtp_tpu.data.loader import batched_loader
        from madtp_tpu.data.transforms import eval_transform

        ds = RetrievalEvalDataset(
            lambda im: eval_transform(im, image_size),
            config["image_root"], config["ann_root"], "test",
            dataset=config.get("dataset", "coco"))
        texts = ds.text
        txt2img, img2txt = ds.txt2img, ds.img2txt
        image_batches = (b[0] for b in batched_loader(
            ds, config.get("batch_size_test", 32)))

    tok = tokenizer(texts, padding="longest", max_length=35)
    text_ids, text_mask = tok["input_ids"], tok["attention_mask"]

    prune = temperature > 0
    img_feats, img_states, txt_feats = encode_corpus(
        params, cfg, iter(image_batches), text_ids, text_mask,
        temperature=temperature, prune_active=prune,
    )
    # ITM rerank uses [ENC]-token text (reference compress_retrieval_dtp:168)
    enc_ids = text_ids.copy()
    enc_ids[:, 0] = tokenizer.enc_token_id
    s_i2t, s_t2i = rerank_scores(
        params, cfg, img_feats, img_states, txt_feats, enc_ids, text_mask,
        k_test=min(k_test, len(texts)), temperature=temperature,
        prune_active=prune,
    )
    stats = itm_eval(s_i2t, s_t2i, txt2img, img2txt)
    log = {k: round(v, 3) for k, v in stats.items()}
    dump_log(args.output_dir, "evaluate.txt", log, append=False)
    print("LOG:", log)


if __name__ == "__main__":
    main()
