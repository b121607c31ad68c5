"""leadyolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch re-design of the capabilities of LEAD-YOLO (a YOLOv5-v7.0-based
SAR ship detector with a FasterNet partial-convolution backbone, RFCBAMConv
receptive-field attention, C3 coordinate-attention blocks, and an EIoU box
loss), built TPU-first:

- NHWC arrays, bf16 compute / fp32 params, static shapes everywhere.
- Functional model: a YAML graph spec compiled to a pure ``apply(params, x)``.
- One jit-compiled train step (fwd + loss + bwd + optimizer + EMA) under a
  data-parallel ``jax.sharding.Mesh``.
- On-device fixed-shape NMS, dense masked target assignment, device-side
  letterbox/normalize.

See SURVEY.md at the repo root for the structural analysis of the reference
this build mirrors (capability-for-capability, not line-for-line).
"""

__version__ = "0.1.0"
