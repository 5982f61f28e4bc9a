"""Structured Streaming parity layer (SURVEY.md §2A A1-A12, §7.2 M5/M6):
quorum dedup, CDC pipeline topology, sinks, replay utilities.
"""
