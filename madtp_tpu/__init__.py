"""madtp-tpu: TPU-native Multimodal Alignment-Guided Dynamic Token Pruning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of double125/MADTP
(CVPR 2024): accelerating BLIP/CLIP vision-language transformers by pruning and
merging tokens at every layer, guided by a learnable cross-modal codebook (FDT)
and a compute-targeted temperature controller.

Design notes (TPU-first, not a port):

* All shapes are static.  The reference shrinks sequences with a per-layer
  ``.item()`` host sync (reference ``models/vit.py:145``); here tokens live in a
  fixed-size buffer with an ``alive`` mask plus pre-allocated merge slots, so a
  whole forward jit-compiles once and never syncs with the host
  (:mod:`madtp_tpu.prune.dtp`).
* Attention emits the pruning signals (CLS attention with head-diversity
  weighting, column mass) as side outputs of the same fused computation
  (:mod:`madtp_tpu.ops.attention`), rather than re-reading saved attention maps.
* Scale-out is SPMD over a ``jax.sharding.Mesh`` with named axes
  (:mod:`madtp_tpu.parallel`), not NCCL process groups.
"""

__version__ = "0.1.0"
