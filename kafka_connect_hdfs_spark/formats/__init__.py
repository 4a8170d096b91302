"""Custom format codecs that don't need external libraries."""
