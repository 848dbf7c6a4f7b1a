"""llm_ops queries (filled in incrementally)."""
