"""egt_tpu: a TPU-native framework for the Edge-augmented Graph Transformer.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of the reference
TensorFlow implementation (shamim-hussain/egt, KDD'22). See SURVEY.md for the
capability map and README.md for usage.
"""

__version__ = "0.1.0"
