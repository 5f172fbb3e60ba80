from rdfshape_api_spark.streaming.validate_stream import (  # noqa: F401
    CLOSE_CODES,
    StreamConfig,
    stream_validate,
)
