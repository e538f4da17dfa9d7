"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch shapes)
is real and tested. Decode: REAL pure-stdlib/NumPy decoders for the public
formats this container can handle without media libraries — BMP (8/24-bpp),
PNG (zlib inflate + unfiltering), WAV (PCM16), and y4m/YUV4MPEG2 video
(planar YUV frames) — dispatched by magic bytes; compressed formats
(jpeg/mp4/h264) fall back to a deterministic md5 fake so pipelines stay
testable end-to-end. Swap in PIL/torchaudio/decord implementations by
registering a decoder.
"""

from velesdb_spark.multimodal.media import (  # noqa: F401
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    audio_decoder,
    decode_and_featurize,
    decode_bmp,
    decode_frames,
    decode_png,
    decode_wav,
    decode_y4m,
    fake_image_decoder,
    frame_sample,
    image_decoder,
    media_table,
    register_decoder,
    synth_png,
    synth_png_col,
    synth_wav,
    synth_wav_col,
    synth_y4m,
    synth_y4m_col,
    video_decoder,
)
