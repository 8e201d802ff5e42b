"""On-disk bitstream container for coded frames.

The reference keeps bitstreams in memory (the sender decodes its own strings,
city_sender.py); tvc adds a serialized container so streams can actually be
transmitted/stored and decoded by a separate receiver process:

    magic 'TVC1' | u16 num_slices | u16 batch | u16 zH | u16 zW
    then z streams, then per slice anchor+non_anchor streams,
    each stream as u32 length + bytes, batch-major within each phase.

'TVC2' extends the header with a coding-profile byte so a receiver can
detect a sender/receiver configuration mismatch BEFORE silently decoding
garbage (rANS has no internal checksum): currently the profile carries the
entropy backend (coding.py — both ends must run the entropy-parameter
executables on the same backend or the streams desync). All tvc writers
(the codec CLI, the GOP payload path) stamp the profile; TVC1 is the
legacy read-compatible format (backend unspecified — no mismatch check)
and remains what `serialize(enc)` with no profile argument produces.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

MAGIC = b"TVC1"
MAGIC2 = b"TVC2"

# profile byte <-> entropy backend (coding.py entropy_backend knob)
_BACKEND_TO_ID = {"cpu": 0, "device": 1}
_ID_TO_BACKEND = {v: k for k, v in _BACKEND_TO_ID.items()}


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


def serialize(enc: Dict[str, Any], entropy_backend: Optional[str] = None) -> bytes:
    """Pack an ELICCoder.compress result into one byte blob.

    entropy_backend: when given, writes a TVC2 container recording the
    backend the entropy-parameter executables ran on; None writes plain
    TVC1 (wire-compatible with earlier rounds, backend unspecified)."""
    y_strings, z_strings = enc["strings"]
    num_slices = len(y_strings)
    batch = len(z_strings)
    zh, zw = enc["shape"]
    if entropy_backend is None:
        head = MAGIC + struct.pack("<HHHH", num_slices, batch, zh, zw)
    else:
        head = MAGIC2 + struct.pack(
            "<HHHHB", num_slices, batch, zh, zw, _BACKEND_TO_ID[entropy_backend])
    body = _pack_stream_list(z_strings)
    for slice_streams in y_strings:
        for phase in slice_streams:  # [anchor, non_anchor]
            assert len(phase) == batch
            body += _pack_stream_list(phase)
    return head + body


def deserialize(blob: bytes, expect_entropy_backend: Optional[str] = None) -> Dict[str, Any]:
    """Unpack into the {strings, shape} structure ELICCoder.decompress takes.

    expect_entropy_backend: the receiver's own backend; raises ValueError on
    a recorded-profile mismatch (decoding with the wrong backend would
    produce silently-corrupt frames). TVC1 containers carry no profile
    (backend None) and skip the check."""
    if blob[:4] == MAGIC:
        num_slices, batch, zh, zw = struct.unpack_from("<HHHH", blob, 4)
        off = 12
        backend = None  # pre-profile container: backend unspecified
    elif blob[:4] == MAGIC2:
        num_slices, batch, zh, zw, bid = struct.unpack_from("<HHHHB", blob, 4)
        off = 13
        backend = _ID_TO_BACKEND.get(bid, f"unknown({bid})")
    else:
        raise AssertionError("not a TVC1/TVC2 container")
    if (expect_entropy_backend is not None and backend is not None
            and backend != expect_entropy_backend):
        raise ValueError(
            f"container was coded with entropy_backend={backend!r} but the "
            f"receiver runs {expect_entropy_backend!r}; streams are only "
            "decodable with matching backends (coding.py)")
    z_strings, off = _unpack_stream_list(blob, off, batch)
    y_strings = []
    for _ in range(num_slices):
        anchor, off = _unpack_stream_list(blob, off, batch)
        non_anchor, off = _unpack_stream_list(blob, off, batch)
        y_strings.append([anchor, non_anchor])
    assert off == len(blob), "trailing bytes in container"
    return {"strings": [y_strings, z_strings], "shape": (zh, zw),
            "entropy_backend": backend}


def save(path: str, enc: Dict[str, Any], entropy_backend: Optional[str] = None) -> int:
    blob = serialize(enc, entropy_backend=entropy_backend)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load(path: str, expect_entropy_backend: Optional[str] = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return deserialize(f.read(), expect_entropy_backend=expect_entropy_backend)
