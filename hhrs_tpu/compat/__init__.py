"""Compatibility oracles: faithful replicas of the reference stack used to
*prove* parity (tests, head-to-head benchmark runs). Nothing here is on the
serve/train hot path; torch is imported lazily."""
