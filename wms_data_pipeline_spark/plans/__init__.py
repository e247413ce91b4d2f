"""Named query registry — the engine's external correctness surface."""

from wms_data_pipeline_spark.plans.queries import REGISTRY, QuerySpec  # noqa: F401
