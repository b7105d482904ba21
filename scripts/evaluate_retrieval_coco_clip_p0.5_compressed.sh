#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval_clip --fast_eval --evaluate --config configs/retrieval_coco_clip.yaml \
    --pretrained output/retrieval_coco_clip_compression_p0.5/clip_large_retrieval_coco_p0.5_compressed.pth \
    --output_dir output/retrieval_coco_clip_compression_p0.5
