#!/bin/bash
# Compress BLIP-NLVR to 19% GFLOPs (reference scripts/compress_nlvr_nlvr2_p0.8.sh;
# SPMD replaces torchrun — one process drives the whole TPU slice)
python -m madtp_tpu.cli.compress_nlvr --fast_train \
    --p 0.8 --epoch 25 \
    --pretrained pretrained/model_base_nlvr.pth \
    --config configs/nlvr.yaml \
    --output_dir output/nlvr_nlvr2_compression_p0.8
