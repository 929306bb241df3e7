"""Operator library: blocking, scoring, clustering, dedup, similarity, text stats."""
