#!/bin/bash
python -m madtp_tpu.cli.compress_vqa --fast_train --p 0.5 --epoch 3 \
    --pretrained pretrained/model_base_vqa_capfilt_large.pth \
    --config configs/vqa.yaml \
    --output_dir output/vqa_vqa2_compression_p0.5
