"""keypointnerf_tpu — a TPU-native generalizable volumetric-avatar engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
facebookresearch/KeypointNeRF (ECCV'22): instant volumetric radiance fields
of humans from 2-3 calibrated images, conditioned on pixel-aligned CNN
features and a relative spatial encoding of 3D body keypoints.

Layer map (mirrors the reference's implicit layering, SURVEY.md §1, but
re-designed TPU-first):

  geometry/   pure-jnp cameras, rays, AABB, sampling, compositing
  ops/        hot primitives (bilinear multi-view gather) + Pallas kernels
  models/     Flax modules: spatial encoder, MLP stack, CNN encoders, IBR head
  render/     jit'd coarse+fine ray-march over fixed-size ray blocks
  parallel/   jax.sharding Mesh + shard_map training/rendering
  data/       host-side numpy loaders (ZJU-MoCap) + synthetic CI dataset
  training/   optax train step, losses (L1/VGG), orbax checkpoints
  evaluation/ metric-parity PSNR/SSIM evaluator
"""

__version__ = "0.1.0"
