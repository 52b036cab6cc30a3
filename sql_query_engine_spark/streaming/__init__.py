"""Streaming-shaped operators over event tables."""
