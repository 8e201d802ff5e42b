"""On-disk bitstream container for coded frames.

The reference keeps bitstreams in memory (the sender decodes its own strings,
city_sender.py); tvc adds a serialized container so streams can actually be
transmitted/stored and decoded by a separate receiver process:

    magic 'TVC1' | u16 num_slices | u16 batch | u16 zH | u16 zW
    then z streams, then per slice anchor+non_anchor streams,
    each stream as u32 length + bytes, batch-major within each phase.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

MAGIC = b"TVC1"


def _pack_stream_list(streams: List[bytes]) -> bytes:
    out = bytearray()
    for s in streams:
        out += struct.pack("<I", len(s))
        out += s
    return bytes(out)


def _unpack_stream_list(buf: bytes, off: int, n: int) -> Tuple[List[bytes], int]:
    out = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        out.append(bytes(buf[off : off + ln]))
        off += ln
    return out, off


def serialize(enc: Dict[str, Any]) -> bytes:
    """Pack an ELICCoder.compress result into one byte blob."""
    y_strings, z_strings = enc["strings"]
    num_slices = len(y_strings)
    batch = len(z_strings)
    zh, zw = enc["shape"]
    head = MAGIC + struct.pack("<HHHH", num_slices, batch, zh, zw)
    body = _pack_stream_list(z_strings)
    for slice_streams in y_strings:
        for phase in slice_streams:  # [anchor, non_anchor]
            assert len(phase) == batch
            body += _pack_stream_list(phase)
    return head + body


def deserialize(blob: bytes) -> Dict[str, Any]:
    """Unpack into the {strings, shape} structure ELICCoder.decompress takes."""
    assert blob[:4] == MAGIC, "not a TVC1 container"
    num_slices, batch, zh, zw = struct.unpack_from("<HHHH", blob, 4)
    off = 12
    z_strings, off = _unpack_stream_list(blob, off, batch)
    y_strings = []
    for _ in range(num_slices):
        anchor, off = _unpack_stream_list(blob, off, batch)
        non_anchor, off = _unpack_stream_list(blob, off, batch)
        y_strings.append([anchor, non_anchor])
    assert off == len(blob), "trailing bytes in container"
    return {"strings": [y_strings, z_strings], "shape": (zh, zw)}


def save(path: str, enc: Dict[str, Any]) -> int:
    blob = serialize(enc)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return deserialize(f.read())
