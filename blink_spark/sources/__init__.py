"""Source-format scans (SURVEY.md §2.1): positional TSV, CoNLL token
streams, sentence splitting, JSONL round-trips."""
