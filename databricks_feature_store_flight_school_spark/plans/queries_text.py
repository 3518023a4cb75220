"""Document-table queries: text analysis, exact + near dedup."""
