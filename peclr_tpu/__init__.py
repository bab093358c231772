"""peclr_tpu — a TPU-native (JAX/XLA/Pallas) framework for equivariant
contrastive pretraining and 2.5D hand-pose estimation.

Re-designed from scratch with the capabilities of the PeCLR reference
(dahiyaaneesh/peclr): SimCLR-style contrastive pretraining where geometric
augmentations act *equivariantly* on the projection space, a torchvision-
parity ResNet encoder family, a 2.5D keypoint head with closed-form z-root
recovery plus MLP refinement, and the full FreiHAND evaluation/leaderboard
stack.

Design stance (TPU-first):
  * Augmentation is a fused, batched, device-side pipeline (ops/augment.py)
    that emits the per-sample transform parameters the equivariant loss
    inverts — the reference's per-sample CPU/OpenCV workers are re-architected
    away, not translated.
  * All compute runs under jit with static shapes; scaling is GSPMD over a
    jax.sharding.Mesh with XLA collectives (parallel/).
  * bf16 activations / f32 params+optimizer by default (train/).
  * Host side (JPEG decode, index shuffling) stays native: a C++ threaded
    decoder (native/) with a ctypes binding feeds pinned batches to device.
"""

__version__ = "0.1.0"
