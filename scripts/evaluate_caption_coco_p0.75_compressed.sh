#!/bin/bash
python -m madtp_tpu.cli.compress_caption --fast_eval --evaluate --config configs/caption_coco.yaml \
    --pretrained output/caption_coco_compression_p0.75/model_base_caption_capfilt_large_coco_p0.75_compressed.pth \
    --output_dir output/caption_coco_compression_p0.75
