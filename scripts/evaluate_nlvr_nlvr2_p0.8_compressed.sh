#!/bin/bash
# Evaluate the p=0.8 compressed NLVR checkpoint (reference
# scripts/evaluate_nlvr_nlvr2_p0.8_compressed.sh; the stored temperature
# scalar drives pruning at eval — reference compress_nlvr_dtp.py:155-157)
python -m madtp_tpu.cli.compress_nlvr --evaluate --fast_eval \
    --pretrained output/nlvr_nlvr2_compression_p0.8/model_base_nlvr_nlvr2_p0.8_compressed.pth \
    --config configs/nlvr.yaml \
    --output_dir output/nlvr_nlvr2_compression_p0.8
