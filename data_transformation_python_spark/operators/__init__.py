"""Engine operators: merge/upsert, CDC, dedup, similarity, text
analysis, multimodal column handling — each designed Spark-first for
cluster scale (no driver-side row loops, broadcast where small,
shuffle only on declared keys)."""
