"""Distributed multi-device sorting layer."""
