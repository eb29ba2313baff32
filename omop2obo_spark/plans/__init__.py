from omop2obo_spark.plans.mention import detect_mentions  # noqa: F401
from omop2obo_spark.plans.pipeline import PipelineResult, run_pipeline  # noqa: F401
