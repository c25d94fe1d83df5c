from jsonify2ai_spark.plans.inspect import (  # noqa: F401
    codegen_stage_count,
    node_count,
    plan_string,
    pushed_filters,
    scan_read_schema,
)
