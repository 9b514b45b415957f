"""Source/sink surface: metadata-driven scans and partitioned writes."""
