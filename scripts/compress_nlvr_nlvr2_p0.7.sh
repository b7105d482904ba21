#!/bin/bash
# Compress BLIP-NLVR to 30% GFLOPs (reference scripts/compress_nlvr_nlvr2_p0.7.sh;
# SPMD replaces torchrun — one process drives the whole TPU slice)
python -m madtp_tpu.cli.compress_nlvr --fast_train \
    --p 0.7 --epoch 15 \
    --pretrained pretrained/model_base_nlvr.pth \
    --config configs/nlvr.yaml \
    --output_dir output/nlvr_nlvr2_compression_p0.7
