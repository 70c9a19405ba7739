"""Baseline codec tier (mirrors the reference's vendored baselines/)."""
