"""controlanimate_tpu — TPU-native vid2vid generation framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
intellerce/controlanimate (reference: /root/reference): AnimateDiff-style
3D-inflated Stable Diffusion UNet with temporal motion modules,
Multi-ControlNet residual conditioning, IP-Adapter image prompting, LCM /
LCM-LoRA few-step sampling, latent-overlap window stitching, color matching,
upscaling, and ffmpeg-based media IO — expressed as jit-compiled functional
JAX (lax.scan denoise loops, pjit/mesh sharding, Pallas attention kernels)
rather than a torch port.
"""

__version__ = "0.1.0"
