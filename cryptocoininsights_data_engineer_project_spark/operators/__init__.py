"""Engine operators: merge/upsert, dedup, similarity search, text
analysis, multimodal column plumbing. Each module documents which
reference behavior (file:line in /root/reference) it re-expresses and
how the Spark plan is shaped for 100 TB scale."""
