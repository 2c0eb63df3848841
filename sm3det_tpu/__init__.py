"""SM3Det-TPU: a TPU-native (JAX/XLA/Pallas) multi-modal multi-task
rotated-object-detection framework.

Re-designed from scratch for TPU with the capabilities of zcablii/SM3Det:
grid-level sparse MoE CNN backbones, a TriSource (SAR/optical/infrared)
detector with heterogeneous heads, dynamic learning-rate adjustment (DLA),
rotated-box geometry, and a config-driven train/test API.
"""

__version__ = "0.1.0"
