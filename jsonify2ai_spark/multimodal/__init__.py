from jsonify2ai_spark.multimodal.columns import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_media_meta,
    decode_image_meta,
    extract_media_features,
    sample_frames,
)
