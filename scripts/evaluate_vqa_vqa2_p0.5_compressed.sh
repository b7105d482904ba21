#!/bin/bash
# --pretrained matches the reference's released-checkpoint path verbatim
# (its eval scripts target renamed release artifacts).  A local compress
# run saves per-epoch checkpoint_NN.pth (no best gate, like the
# reference) — point --pretrained at checkpoint_02.pth to evaluate it.
python -m madtp_tpu.cli.compress_vqa --fast_eval --evaluate --config configs/vqa.yaml \
    --pretrained output/vqa_vqa2_compression_p0.5/model_base_vqa_capfilt_large_vqa2_p0.5_compressed.pth \
    --output_dir output/vqa_vqa2_compression_p0.5
