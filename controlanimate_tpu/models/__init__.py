"""Flax model stack: VAE, CLIP text/vision, UNet3D + motion modules,
ControlNet, IP-Adapter projections, upscalers, annotators."""
