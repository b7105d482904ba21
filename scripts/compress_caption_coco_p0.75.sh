#!/bin/bash
python -m madtp_tpu.cli.compress_caption --fast_train --p 0.75 --epoch 5 \
    --pretrained pretrained/model_base_caption_capfilt_large.pth --config configs/caption_coco.yaml \
    --output_dir output/caption_coco_compression_p0.75
