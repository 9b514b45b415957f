"""Structured Streaming surface: event-time windows, watermarks, state."""
