SELECT COUNT(*) AS failed_rows
FROM analytics.gold_daily_revenue
WHERE revenue < 0
