"""Top-level compress / decompress / roundtrip API.

Mirrors the reference CLI's three commands (reference recode.cpp:1627-1659)
with the same acceptance semantics: roundtrip must reproduce the input file
byte-for-byte (reference recode.cpp:1594-1624).
"""
from __future__ import annotations

from dataclasses import dataclass

from . import host


@dataclass
class RoundtripReport:
    ok: bool
    input_bytes: int
    compressed_bytes: int
    ratio: float  # compressed / original (reference recode.cpp:1606)
    container_overhead: float  # fraction of compressed not literal/recoded payload
    stats: host.Stats


def compress(data: bytes, lanes: int = 16, chunk_mode: int = 0,
             batch_size: int = 1, model_profile: int = 0) -> tuple[bytes, host.Stats]:
    return host.compress(data, lanes=lanes, chunk_mode=chunk_mode, batch_size=batch_size,
                         model_profile=model_profile)


def decompress(data: bytes) -> tuple[bytes, host.Stats]:
    return host.decompress(data)


def roundtrip(data: bytes, lanes: int = 16, chunk_mode: int = 0,
              batch_size: int = 1, model_profile: int = 0) -> RoundtripReport:
    comp, st = compress(data, lanes=lanes, chunk_mode=chunk_mode, batch_size=batch_size,
                        model_profile=model_profile)
    dec, _ = decompress(comp)
    ok = dec == data
    payload = st.literal_bytes + st.recoded_bytes
    overhead = 1.0 - payload / len(comp) if comp else 0.0
    return RoundtripReport(
        ok=ok,
        input_bytes=len(data),
        compressed_bytes=len(comp),
        ratio=len(comp) / len(data) if data else 0.0,
        container_overhead=overhead,
        stats=st,
    )
