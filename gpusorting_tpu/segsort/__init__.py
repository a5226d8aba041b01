"""Segmented sort (SplitSort analog)."""
