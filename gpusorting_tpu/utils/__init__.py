"""Validation and timing utilities."""
