"""Offline data/weight tooling (reference scripts/ + model tooling)."""
