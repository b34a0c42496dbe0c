"""nerf_rpn_tpu — a TPU-native JAX/XLA/Pallas framework for object detection in NeRFs.

Re-designed from scratch for TPU hardware with the capabilities of the
NeRF-RPN reference (CVPR 2023, arXiv:2211.11646):

- ``ops``        pure-jnp / Pallas geometry: AABB & rotated-OBB IoU, NMS,
                 box coders, rotated 3D ROI align.
- ``models``     flax.linen 3D backbones (VGG / ResNet / Swin), FPN neck,
                 anchor-based RPN head, anchor-free FCOS head, RCNN stage 2.
- ``data``       rgbsigma .npz voxel-grid datasets with bucketing + masking.
- ``parallel``   jax.sharding mesh / SPMD helpers (data parallel over scenes).
- ``train``      jitted train steps, optax schedules, orbax checkpoints.
- ``evaluation`` Recall / AR / AP metric suite.
- ``cli``        flag-compatible run_rpn / run_fcos / run_rpn_detect drivers.

Design rules (everywhere): static shapes, explicit validity masks instead of
boolean filtering, no host round-trips in the hot path, bfloat16 matmul paths
with float32 accumulation.
"""

__version__ = "0.1.0"
