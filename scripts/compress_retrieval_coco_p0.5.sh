#!/bin/bash
# NOTE: --p 0.45 != the filename's p0.5 — this mirrors the reference's own
# scripts/compress_retrieval_coco_p0.5.sh (its released runs used the adjusted ratio).
python -m madtp_tpu.cli.compress_retrieval --fast_train --p 0.45 --epoch 5 \
    --pretrained pretrained/model_base_retrieval_coco.pth --config configs/retrieval_coco.yaml \
    --output_dir output/retrieval_coco_compression_p0.45_T1
