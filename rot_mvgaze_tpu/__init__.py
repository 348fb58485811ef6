"""rot_mvgaze_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
rotation-constrained multi-view gaze estimation.

Re-designed from scratch with the capabilities of the reference
ut-vision/Rot-MVGaze (WACV 2024, arXiv 2305.12704), but built TPU-first:

- ``geometry``: pure-JAX gaze math (pitchyaw <-> vector, SO(3), angular error).
- ``models``: flax.linen NHWC ResNet family + rotation-constrained cross-view
  fusion model (``FeatRotationSymm``), dict-pytree in/out.
- ``losses``: pure functions over the output pytree.
- ``data``: HDF5-backed multi-view dataset with stereo pair index and camera
  splits; synthetic in-memory fixtures for tests.
- ``augment``: PRNG-key-driven, jit-compatible on-device augmentation.
- ``ops``: Pallas TPU kernels for the hot fusion path.
- ``parallel``: ``jax.sharding.Mesh`` / ``shard_map`` data-parallel training.
- ``train``: trainer, cyclic LR schedule, Orbax checkpoints, TensorBoard writer.
- ``compat``: PyTorch checkpoint -> JAX parameter-pytree converter.
- ``cli``: a ``main.py``-compatible command line.
"""

__version__ = "0.1.0"
