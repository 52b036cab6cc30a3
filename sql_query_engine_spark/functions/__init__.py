"""Text / dedup / similarity / multimodal function library."""
