#!/bin/bash
# NOTE: --p 0.65 != the filename's p0.75 — this mirrors the reference's own
# scripts/compress_retrieval_flickr_p0.75.sh (its released runs used the adjusted ratio).
python -m madtp_tpu.cli.compress_retrieval --fast_train --p 0.65 --epoch 10 \
    --pretrained pretrained/model_base_retrieval_flickr.pth --config configs/retrieval_flickr.yaml \
    --output_dir output/retrieval_flickr_compression_p0.65
