#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_train --p 0.5 --epoch 10 \
    --pretrained pretrained/model_base_retrieval_flickr.pth --config configs/retrieval_flickr.yaml \
    --output_dir output/retrieval_flickr_compression_p0.5
