#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval_clip --fast_train --p 0.75 --epoch 5 \
    --pretrained pretrained/clip_large_retrieval_coco.pth --config configs/retrieval_coco_clip.yaml \
    --output_dir output/retrieval_coco_clip_compression_p0.75
