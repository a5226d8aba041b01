"""Subpackage of gpusorting_tpu."""
