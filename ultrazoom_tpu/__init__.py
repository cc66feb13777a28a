"""ultrazoom_tpu — TPU-native single-image super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
andrewdalpino/UltraZoom (MewZoom): NHWC bf16 compute, functional pytree
models, torch-checkpoint interop, overlap-tile streaming inference, and
mesh-sharded training.
"""

__version__ = "0.1.0"
