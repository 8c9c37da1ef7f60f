"""Structured Streaming layer: landing-zone file ingest, watermarked
event-time windows, sessionization, stateful ops (SURVEY §2.8 — the
reference's periodic batch ingest generalized to streams)."""
