"""Greedy metapath search engine (vmapped relation sweeps)."""
