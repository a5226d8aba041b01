"""Core types: config, key codecs, PRNG fixtures."""
