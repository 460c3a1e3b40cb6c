"""DataFrame → DataFrame operators: audits, reshape, top-k, sampling,
joins, dedup, similarity search. Each is a pure transformation so Catalyst
sees the whole plan (pushdown, pruning, partial aggregation all apply).
"""
