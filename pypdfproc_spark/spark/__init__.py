"""Spark DataFrame layer: sessions, the extraction pipeline, and the
training-data operators.  Everything per-document lives in ``core``;
everything here is declarative DataFrame plumbing that Catalyst optimizes."""
