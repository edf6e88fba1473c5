"""unet_torch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) segmentation & cell-counting
framework with the capabilities of the PyTorch reference caki35/UNet-Torch.

Built from scratch, TPU-first:
  * NHWC layouts feeding the MXU; bf16 compute with f32 accumulation by default.
  * Pure, jit-compiled train/eval step functions (no Python in the hot loop).
  * SPMD data parallelism over a `jax.sharding.Mesh` — collectives inserted by XLA.
  * Pallas kernels for the hot fused ops, with XLA fallbacks as correctness oracles.

Subpackages
-----------
core      meshes, precision policy, PRNG threading
kernels   Pallas TPU kernels (fused conv+BN+ReLU, attention, ...)
nn        Flax building blocks (DoubleConv/Down/Up/OutConv/AttentionGate, ...)
models    UNet family, TransUnet family, CLTR conditional-DETR
losses    dice/bce/ce/focal/tversky/topk/hem/hausdorff/topo/... + calc_loss dispatch
data      datasets, decoding (channel codes, stain), augmentation, tiling
train     Trainer + jit'd step functions (single/multitask/uncertainty/ratio/CLTR)
eval      counting/matching metrics + CSV/plot report suite
ckpt      checkpoint save/restore (epoch{N}/best/last contract) + ViT .npz loader
parallel  sharding helpers for multi-chip meshes
"""

__version__ = "0.1.0"
