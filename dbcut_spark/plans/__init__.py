from dbcut_spark.plans.extraction import ExtractionPlan, build_plan  # noqa: F401
