from searchengine_spark.plans.build_index import build_index, BuildResult  # noqa: F401
from searchengine_spark.plans.stats import statistics  # noqa: F401
