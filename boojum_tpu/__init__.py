"""boojum_tpu — a TPU-native Boojum-class PLONKish + FRI proving framework.

Built from scratch in JAX/XLA/Pallas. Capability target: matter-labs/era-boojum
(see SURVEY.md); architecture target: TPU hardware (see BASELINE.md).
"""

__version__ = "0.1.0"
