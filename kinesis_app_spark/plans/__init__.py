from kinesis_app_spark.plans.lint import (  # noqa: F401
    PlanSummary,
    assert_no_cartesian,
    plan_summary,
)
