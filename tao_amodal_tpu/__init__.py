"""TAO-Amodal TPU: a TPU-native (JAX/XLA/Pallas) amodal tracking framework.

A ground-up rebuild of the capabilities of the TAO-Amodal reference stack
(evaluation, visualization, single/multi-object trackers, training) designed
for TPU hardware:

- All numeric hot paths (IoU matrices, track matching, PR accumulation,
  Kalman filtering, Hungarian assignment, cross-correlation, RoI pooling)
  are batched, statically-shaped XLA programs; Pallas kernels cover the ops
  XLA cannot fuse well (precise RoI pooling, fused preprocessing).
- Scale-out goes through ``jax.sharding.Mesh`` + NamedSharding collectives
  (data-parallel training, frame-sharded context-parallel evaluation),
  never through per-process NCCL plumbing.
- Host-side codecs (COCO RLE, polygon rasterization) are a small C++
  library bound via ctypes, with pure-numpy fallbacks.

Public surface mirrors the reference's entry points: the ``tools/``
CLI scripts, the prediction JSON schema, and the evaluator metric names
are kept byte-compatible.
"""

__version__ = "0.1.0"
