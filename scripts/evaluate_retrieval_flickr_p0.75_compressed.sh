#!/bin/bash
python -m madtp_tpu.cli.compress_retrieval --fast_eval --evaluate --config configs/retrieval_flickr.yaml \
    --pretrained output/retrieval_flickr_compression_p0.75/model_base_retrieval_flickr_p0.75_compressed.pth \
    --output_dir output/retrieval_flickr_compression_p0.75
