from jsonify2ai_spark.sinks.export import (  # noqa: F401
    export_jsonl,
    ingest_mirror,
    write_training_shards,
    zip_export,
)
