"""Pixel-grounding stack: tagging, entity matching, detection,
segmentation, tracking, evaluation."""
