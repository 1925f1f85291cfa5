"""Data: rollout storage layout helpers."""
