#!/bin/bash
# NOTE: --p 0.4 != the filename's p0.5 — this mirrors the reference's own
# scripts/compress_caption_coco_p0.5.sh (its released runs used the adjusted ratio).
python -m madtp_tpu.cli.compress_caption --fast_train --p 0.4 --epoch 5 \
    --pretrained pretrained/model_base_caption_capfilt_large.pth --config configs/caption_coco.yaml \
    --output_dir output/caption_coco_compression_p0.4
