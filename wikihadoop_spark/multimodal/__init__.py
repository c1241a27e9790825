"""Multimodal (image/audio/video) column processing.

Opaque ``binary`` payload columns + typed metadata structs, processed
with Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schemas,
partitioning, UDF signatures, batch shapes) is real and tested; the
codec step is pluggable and STUBBED in this environment (no image/
audio libraries in the container): ``backend="fake"`` produces
deterministic synthetic outputs for pipeline testing, ``backend="real"``
raises NotImplementedError unless the optional libraries import.
"""

from .media import (
    MEDIA_SCHEMA,
    image_metadata,
    image_resize,
    audio_features,
    video_frame_sample,
)

__all__ = [
    "MEDIA_SCHEMA",
    "image_metadata",
    "image_resize",
    "audio_features",
    "video_frame_sample",
]
