"""Distributed crawl operators (SURVEY.md §2) plus the training-data-pipeline
operator suite (dedup / similarity / text analysis / multimodal plumbing)."""
