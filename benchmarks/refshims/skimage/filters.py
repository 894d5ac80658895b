"""Imported by the reference but never called in the pipeline paths."""
