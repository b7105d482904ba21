#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_eval --evaluate --config configs/retrieval_coco.yaml \
    --pretrained output/retrieval_coco_compression_p0.75/checkpoint_best.pth \
    --output_dir output/retrieval_coco_evaluate_p0.75
