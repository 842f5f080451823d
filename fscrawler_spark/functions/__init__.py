"""Column-level functions: URL parsing, content extraction, text analytics."""
