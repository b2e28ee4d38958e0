"""TPU-native ops: resize/upsample, Pallas fused kernels."""

from .resize import resize_bilinear, upsample_nearest, resize_nearest

__all__ = ["resize_bilinear", "upsample_nearest", "resize_nearest"]
