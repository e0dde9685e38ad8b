"""Pipeline plans (medallion ETL, anomaly scoring)."""
