"""Driver-facing queries: each module registers (Spark builder, DuckDB
oracle SQL) pairs via plans.registry.query.

Mapping of the driver's synthetic tables onto the NILM model (FIXTURES.md §3):
events(user_id→house, event_type→channel label, value→power) plays
``readings``; documents/embeddings back the §2.10 pipeline extensions;
the TPC-H-ish star tables exercise relational join/agg/set/top-k shapes.
"""
