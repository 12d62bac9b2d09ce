"""LLM-pipeline operator corpus — filled in incrementally."""
