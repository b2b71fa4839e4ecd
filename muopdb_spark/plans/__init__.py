from muopdb_spark.plans.planner import KnnPlan, plan_knn  # noqa: F401
