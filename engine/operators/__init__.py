"""Layer B operators: relational queries, windows, dedup, similarity
search, text analysis, multimodal plumbing, as-of joins, and the
DataFrame-native re-expressions of the reference's MapReduce workloads.
"""
