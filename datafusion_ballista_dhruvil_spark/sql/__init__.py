from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql

__all__ = ["rewrite_sql"]
