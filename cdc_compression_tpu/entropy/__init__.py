from .codec import CodecTables, ImageCodec
from .coder import (
    CdfTable,
    build_gaussian_tables,
    build_prior_tables,
    decode_symbols,
    encode_symbols,
    pmf_to_quantized_cdf,
    scale_indexes,
    scale_table,
)

__all__ = [
    "CdfTable",
    "CodecTables",
    "ImageCodec",
    "build_gaussian_tables",
    "build_prior_tables",
    "decode_symbols",
    "encode_symbols",
    "pmf_to_quantized_cdf",
    "scale_indexes",
    "scale_table",
]
