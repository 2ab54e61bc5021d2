"""TPU-native few-shot object detection framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``hoangpnhat/FewShotObjectDetection_imporove_via_text_feature`` (a DeFRCN fork
with a text-feature branch), built TPU-first:

  * fixed-shape, batched, jit-compiled compute everywhere (no per-image Python
    loops in the hot path),
  * Pallas kernels / fused XLA for the ops the reference delegates to CUDA
    (ROIAlign, NMS, IoU matching, fg/bg sampling),
  * ``jax.custom_vjp`` for the Gradient Decoupled Layer,
  * data-parallel scaling via ``jax.sharding.Mesh`` + NamedSharding instead of
    DDP/NCCL.

Layer map mirrors the reference (see SURVEY.md §1): config -> data -> ops ->
models -> solver/engine -> evaluation -> tools.
"""

__version__ = "0.1.0"
