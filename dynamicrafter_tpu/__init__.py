"""DynamiCrafter-TPU: a TPU-native (JAX/Flax/Pallas) image-to-video latent
diffusion framework with the capabilities of DynamiCrafter (ECCV 2024).

Rebuilt from scratch for TPU: channels-last 5D tensors, pjit/shard_map SPMD
over a (data, seq) mesh, Pallas flash-attention kernels, DDIM sampling as a
single jitted lax.scan with batched CFG passes.
"""

__version__ = "0.1.0"
