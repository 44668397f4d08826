"""End-to-end Ray Data pipelines: polygon-side derivation (streets →
blocks → parcels / buildings → complexity) and the flagship page join.
"""
