"""Operator families (SURVEY §2).

- :mod:`.normalize`  — Part A fidelity: the trace→CloudEvent transform family (B2-B8).
- :mod:`.graph`      — node/edge materialization + graph-shaped joins (B9-B14).
- :mod:`.analytics`  — relational analytical surface (B15-B25).
- :mod:`.dedup`      — exact + near-duplicate document dedup (B33).
- :mod:`.similarity` — embedding similarity search (B34).
- :mod:`.text`       — text analysis: lang-id, quality, tokens, fingerprints (B35).
- :mod:`.multimodal` — opaque binary columns + Pandas-UDF plumbing (B36).
"""
