from datacurator_jl_spark.multimodal.binary import (
    decode_images,
    extract_html_text,
    frame_sample_plan,
    sniff_content_type,
)

__all__ = [
    "sniff_content_type",
    "extract_html_text",
    "decode_images",
    "frame_sample_plan",
]
