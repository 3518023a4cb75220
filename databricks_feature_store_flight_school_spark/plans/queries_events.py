"""Event-table queries: batch time windows, as-of join, JSON extraction."""
