#!/bin/bash
python -m madtp_tpu.cli.compress_vqa --fast_eval --evaluate --config configs/vqa.yaml \
    --pretrained output/vqa_compression_p0.5/checkpoint_best.pth \
    --output_dir output/vqa_evaluate_p0.5
