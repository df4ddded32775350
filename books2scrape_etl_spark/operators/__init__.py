"""Operator library: binning, dedup, similarity, text analysis, multimodal."""
