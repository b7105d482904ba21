#!/bin/bash
python -m madtp_tpu.cli.compress_caption --fast_eval --evaluate --config configs/caption_coco.yaml \
    --pretrained output/caption_coco_compression_p0.5/checkpoint_best.pth \
    --output_dir output/caption_coco_evaluate_p0.5
