from searchengine_spark.oracle.oracle import OracleEngine  # noqa: F401
