"""Operator layer: the four pipeline stages plus the crocodile-parity
ranking/feature operators and the training-data utilities (dedup, ANN,
text analysis, multimodal plumbing)."""
