"""Data layer: corpus streaming, tokenization, synthetic generators, triplet mining."""
