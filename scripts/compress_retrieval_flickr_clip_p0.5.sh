#!/bin/bash
# NOTE: --p 0.55 != the filename's p0.5 — this mirrors the reference's own
# scripts/compress_retrieval_flickr_clip_p0.5.sh (its released runs used the adjusted ratio).
python -m madtp_tpu.cli.compress_retrieval_clip --fast_train --p 0.55 --epoch 5 \
    --pretrained pretrained/clip_large_retrieval_flickr.pth --config configs/retrieval_flickr_clip.yaml \
    --output_dir output/retrieval_flickr_clip_compression_p0.55
