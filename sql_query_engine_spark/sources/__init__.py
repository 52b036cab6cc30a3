"""Source/sink connectors."""
