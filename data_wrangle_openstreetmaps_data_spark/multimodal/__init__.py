"""Multimodal column plumbing (EXT, SURVEY.md §2.7).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
(the one place Python-side compute is the right tool — per-blob media
codecs). The actual codec libraries are not in this container, so the
decode kernels are STUBBED behind ``FAKE_DECODERS`` (deterministic fakes)
/ NotImplementedError — the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested.
"""

from data_wrangle_openstreetmaps_data_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_features,
    frame_sample,
)
