"""Crawl plans: the checkpointed micro-batch wave loop (SURVEY.md §3.3)."""
