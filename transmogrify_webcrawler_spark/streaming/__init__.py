"""Streaming/incremental (SURVEY.md §2.8).

The crawl itself is a checkpointed micro-batch wave loop (plans/crawl.py) —
Structured-Streaming-*style*, driver-looped because the frontier feeds
itself. This package holds the genuinely streaming pieces: continuous
ingestion of newly-landed page captures (readStream -> extraction UDFs ->
append sink) and watermarked windowed rollups over event streams.
"""
