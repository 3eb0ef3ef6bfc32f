"""semstereo_tpu — a TPU-native stereo-matching + semantic-segmentation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
chenchen235/SemStereo (AAAI 2025): one multi-task network predicting a
disparity map and left/right semantic segmentation from a rectified stereo
pair, with semantics constraining stereo implicitly (shared backbone,
semantic-gated cost volumes, SSR upsampling) and explicitly (the LRSC
left-right semantic-consistency loss).

Design (TPU-first, not a port):
  * channels-last layouts everywhere: images [B,H,W,C], volumes [B,D,H,W,C]
  * functional flax.linen modules; a single jitted train step; GSPMD sharding
    over a jax.sharding.Mesh for data / disparity-plane parallelism
  * ops/ — pure-jnp reference math + Pallas TPU kernels for the hot ops
  * orbax checkpoints with partial-tree restore for stage-1 -> stage-2
"""

__version__ = "0.1.0"
