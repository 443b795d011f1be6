"""Structured Streaming surface (the reference is batch-only; this module
exists so the engine covers streaming ingestion of the events table shape)."""
