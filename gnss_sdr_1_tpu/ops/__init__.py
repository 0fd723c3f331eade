"""Device compute kernels (XLA + Pallas).

Reference parity: src/algorithms/libs/volk_gnsssdr_module/ — the reference's
50-kernel SIMD library (rotator+multi-dot-product, code resampler, sincos,
magnitude^2, index-max) and the CUDA multicorrelator
(src/algorithms/tracking/libs/cuda_multicorrelator.cu) collapse into the
batched ops here (SURVEY.md §2.13): XLA fuses the elementwise chains; the
multicorrelator has a fused Pallas TPU kernel with an XLA fallback.
"""

from .multicorrelator import multicorrelate, multicorrelate_batch

__all__ = ["multicorrelate", "multicorrelate_batch"]
