SELECT CASE WHEN
    (SELECT COUNT(*) FROM analytics_pipeline.silver_tokenized)
        = (SELECT COUNT(*) FROM analytics_pipeline.silver_decontam)
    AND (SELECT COUNT(*) FROM analytics_pipeline.silver_decontam)
        <= (SELECT COUNT(*) FROM analytics_pipeline.silver_scrubbed)
    AND (SELECT COUNT(*) FROM analytics_pipeline.silver_scrubbed)
        = (SELECT COUNT(*) FROM analytics_pipeline.silver_dedup)
    AND (SELECT COUNT(*) FROM analytics_pipeline.silver_dedup)
        <= (SELECT COUNT(*) FROM analytics_pipeline.silver_quality)
    AND (SELECT COUNT(*) FROM analytics_pipeline.silver_quality)
        <= (SELECT COUNT(*) FROM analytics_pipeline.bronze_documents)
    THEN 0 ELSE 1 END AS failed_rows
