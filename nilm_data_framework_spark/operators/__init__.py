"""Operator library: pure DataFrame transformations over the canonical model.

Each module maps to a SURVEY.md §2 block:
  selectors   — §2.2 projections / filters / predicates (P1-P15)
  resample    — §2.4 A1 time-bucket resample + A6 rate inference + upsample guard
  aggregates  — §2.4 A2-A15 aggregations
  windows     — §2.5 W1-W7 window functions / sliding windows / gaps-and-islands
  joins       — §2.3 J1-J6 + as-of/range join extensions
  dedup       — §2.10 exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
  similarity  — §2.10 embedding cosine top-k (brute force + LSH-bucketed)
  text        — §2.10 language-ID, quality scoring, token counts, fingerprints
  multimodal  — §2.10 opaque binary columns + mapInPandas decode plumbing
  tensorize   — §3 entry point 3: windowed (X, Y) tensor export
  skew        — SCALE.md salted-join escalation for pathological hot keys
  sampling    — §2.10 mixture sampling, per-stratum reservoirs, packing
  splits      — §2.10 content-hash train/val/test splits
  parallelism — small-input parallelize helpers for compute-heavy stages
"""
