#!/bin/bash
python -m madtp_tpu.cli.compress_nlvr --fast_eval --evaluate \
    --pretrained output/nlvr_nlvr2_compression_p0.5/checkpoint_best.pth \
    --config configs/nlvr.yaml \
    --output_dir output/nlvr_nlvr2_evaluate_p0.5
