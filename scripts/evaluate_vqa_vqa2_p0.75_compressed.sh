#!/bin/bash
# VQA saves per-epoch checkpoints (no best gate, like the reference);
# checkpoint_02.pth is the final epoch of the paired --epoch 3 compress run
python -m madtp_tpu.cli.compress_vqa --fast_eval --evaluate --config configs/vqa.yaml \
    --pretrained output/vqa_compression_p0.75/checkpoint_02.pth \
    --output_dir output/vqa_evaluate_p0.75
