#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_eval --evaluate --config configs/retrieval_flickr.yaml \
    --pretrained output/retrieval_flickr_compression_p0.75/checkpoint_best.pth \
    --output_dir output/retrieval_flickr_evaluate_p0.75
