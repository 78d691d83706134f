"""Model layer: the EGT attention op, the dual-stream transformer stack, feature
embeddings and task heads — pure-functional JAX (params pytree + jit-compiled apply),
the TPU-native re-design of the reference's Keras layer graph (`lib/models/`)."""
