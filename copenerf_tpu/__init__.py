"""copenerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for joint optimization of
neural radiance fields and continuous camera motion from monocular video.

Re-implements, TPU-first, the full capability surface of the CoPE-NeRF reference
(CVPR 2025): a time-conditioned neural SDF scene representation rendered with
NeuS-style volume rendering, a continuous camera-motion model (MLP t -> SE(3)
velocity, integrated to poses), two-stage training (local-frame then canonical
world-frame), pose refinement, and a full NVS/depth/pose evaluation stack.

Design stance (differs deliberately from the reference's eager PyTorch):
  * fields are pure-functional param pytrees + apply fns,
  * the renderer + losses + optimizer update is ONE jitted function,
  * SDF spatial gradients come from forward-mode AD (jvp), not autograd-in-forward,
  * rays shard over a `jax.sharding.Mesh` data axis; params are replicated and
    gradients all-reduced over ICI,
  * hot no-grad MLP sweeps run as fused Pallas kernels.
"""

__version__ = "0.1.0"
