"""LLM-training-data pipeline queries over documents/embeddings
(BASELINE.json north star; SURVEY.md §7 phase 4): dedup, similarity
search, text analysis. Filled in by functions/ as operators land."""

from __future__ import annotations
