"""Structured Streaming surface.

The reference has NO streaming semantics (SURVEY.md §2.6) — its
"stream" is incremental I/O over one static file. This package is the
forward-looking surface a continuously-updated corpus needs: file-source
ingestion of the events table, event-time windowed aggregation with
watermarks, and streaming versions of the audit counters.
"""
