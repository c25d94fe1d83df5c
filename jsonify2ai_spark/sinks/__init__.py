from jsonify2ai_spark.sinks.export import (  # noqa: F401
    export_jsonl,
    ingest_mirror,
    write_token_shards,
    write_training_shards,
    zip_export,
)
