#!/bin/bash
python -m madtp_tpu.cli.compress_caption --fast_train --p 0.5 --config configs/caption_coco.yaml \
    --output_dir output/caption_coco_compression_p0.5
