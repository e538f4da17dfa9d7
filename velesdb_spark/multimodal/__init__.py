"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch shapes)
is real and tested; the actual media decode is STUBBED behind
``DECODERS`` because image/audio libraries are not available in this
container — swap in PIL/torchaudio/decord implementations by registering a
decoder. A deterministic fake decoder is provided so pipelines are testable
end-to-end.
"""

from velesdb_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_and_featurize,
    fake_image_decoder,
    frame_sample,
    media_table,
    register_decoder,
)
