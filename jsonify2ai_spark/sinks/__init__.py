from jsonify2ai_spark.sinks.export import (  # noqa: F401
    export_jsonl,
    ingest_mirror,
    zip_export,
)
