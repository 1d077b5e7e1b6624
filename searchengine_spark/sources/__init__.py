from searchengine_spark.sources.catalog import TableCatalog  # noqa: F401
from searchengine_spark.sources.transcripts import (  # noqa: F401
    generate_transcripts,
    transcripts_spark_df,
    TRANSCRIPTS_SCHEMA,
)
