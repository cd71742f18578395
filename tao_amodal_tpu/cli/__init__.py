"""Command-line entry points (reference-compatible surfaces)."""
