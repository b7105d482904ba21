#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_train --p 0.5 --epoch 5 \
    --pretrained pretrained/model_base_retrieval_coco.pth --config configs/retrieval_coco.yaml \
    --output_dir output/retrieval_coco_compression_p0.5
