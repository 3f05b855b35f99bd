"""Reference-compatible command-line drivers."""
