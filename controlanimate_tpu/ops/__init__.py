"""On-device tensor ops: attention dispatch, Pallas kernels, image ops,
color matching, blending."""

from .attention import dot_product_attention, reference_attention, set_pallas_enabled

__all__ = ["dot_product_attention", "reference_attention", "set_pallas_enabled"]
