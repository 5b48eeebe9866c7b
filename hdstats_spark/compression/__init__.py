"""Tier-table compression codecs: Gorilla XOR floats + delta-of-delta
timestamps, vectorized NumPy encode AND decode (no per-row Python)."""

from .gorilla import (
    decode_dod_timestamps,
    decode_xor_floats,
    encode_dod_timestamps,
    encode_xor_floats,
)

__all__ = [
    "encode_xor_floats",
    "decode_xor_floats",
    "encode_dod_timestamps",
    "decode_dod_timestamps",
]
