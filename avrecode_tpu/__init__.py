"""avrecode_tpu — TPU-native H.264 lossless recompression framework.

A from-scratch re-architecture of ddkang/avrecode for TPU: native C++ host
engine (H.264 entropy layer, CABAC, prior model, rANS lanes, container) plus
JAX/Pallas device paths for batched model evaluation and lane-parallel entropy
coding, sharded over GOP/slice meshes.
"""
__version__ = "0.1.0"

from . import pipeline  # noqa: F401
