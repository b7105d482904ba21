#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_eval --evaluate --config configs/retrieval_coco.yaml \
    --pretrained output/retrieval_coco_compression_p0.75/model_base_retrieval_coco_p0.75_compressed.pth \
    --output_dir output/retrieval_coco_compression_p0.75
