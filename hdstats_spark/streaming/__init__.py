"""Structured Streaming surface: continuous 1m tier with watermarked late
data (optional engine surface, SURVEY.md §2.10)."""
