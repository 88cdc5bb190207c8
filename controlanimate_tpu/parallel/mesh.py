"""Device mesh + sharding plan.

The reference is single-process single-GPU (hardcoded "cuda",
modules/controlanimate_pipeline.py:68; torch.distributed imported but never
initialized, animatediff/utils/util.py:8,24-25). The TPU build scales via a
named mesh from day one (SURVEY §5.8):

  axes:  data    — windows / CFG batch (embarrassingly parallel)
         context — the frame axis of the temporal window (sequence/context
                   parallelism: temporal attention all-gathers K/V over
                   <=32 frames, tiny over ICI)

Single chip is the degenerate 1x1 mesh; multi-chip is a sharding change,
not a code change. Model (tensor) parallelism for the UNet channel dims can
be added as a third axis without restructuring (the sharding rules live
here, not in the models).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "context"),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices. Default: all devices on `data`."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not shape:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_video(mesh: Mesh) -> NamedSharding:
    """(B, F, H, W, C): batch on data, frames on context."""
    return NamedSharding(mesh, P("data", "context"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """(B, ...): batch on data only."""
    return NamedSharding(mesh, P("data"))


def shard_params(mesh: Mesh, params):
    """Parameters replicated across the mesh (SD1.5 fits per chip); when the
    mesh carries a non-trivial `model` axis, large kernels shard tensor-
    parallel instead (see shard_params_tp)."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        return shard_params_tp(mesh, params)
    return jax.device_put(params, replicated(mesh))


def shard_params_tp(mesh: Mesh, params, axis: str = "model", min_size: int = 1 << 16):
    """Tensor parallelism over the UNet/VAE channel dims: shard the OUTPUT
    feature dim (last axis of conv HWIO / dense (in, out) kernels) across
    the `model` mesh axis; small tensors (biases, norms, embeddings) stay
    replicated. GSPMD propagates the shardings through the jitted window
    programs and inserts the collectives — Megatron-style column parallelism
    without manual partitioning (SURVEY §2.13: TP listed optional)."""
    n = mesh.shape[axis]

    def place(x):
        if (
            getattr(x, "ndim", 0) >= 2
            and x.size >= min_size
            and x.shape[-1] % n == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + [axis]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, params)


def _fits(x, mesh: Mesh, axes: Sequence[str], dims: Sequence[int]) -> bool:
    return all(x.shape[d] % mesh.shape[a] == 0 for a, d in zip(axes, dims))


def shard_window_inputs(mesh: Mesh, text_embeds, cond_images, input_frames, last_output_frames):
    """Place window inputs: batch-sharded embeds, video tensors on
    data x context. Tensors whose axes don't divide the mesh (e.g. a short
    overlap-anchor frame stack) replicate on the offending axis."""
    sb, sv = shard_batch(mesh), shard_video(mesh)
    rep = replicated(mesh)

    def place_video(x):
        if x is None:
            return None
        if _fits(x, mesh, ("data", "context"), (0, 1)):
            return jax.device_put(x, sv)
        if _fits(x, mesh, ("data",), (0,)):
            return jax.device_put(x, sb)
        return jax.device_put(x, rep)

    def place_batch(x):
        if x is None:
            return None
        if _fits(x, mesh, ("data",), (0,)):
            return jax.device_put(x, sb)
        return jax.device_put(x, rep)

    return (
        place_batch(text_embeds),
        tuple(place_video(c) for c in cond_images),
        place_video(input_frames),
        place_video(last_output_frames),
    )
