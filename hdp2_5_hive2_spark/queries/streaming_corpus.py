"""Event-time windowing corpus (batch equivalents) — filled in incrementally."""
