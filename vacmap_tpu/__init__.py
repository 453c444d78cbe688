"""vacmap-tpu: a TPU-native long-read aligner for structural-variant
discovery, with the capabilities of VACmap (non-linear chaining)."""

__version__ = "0.1.0"
