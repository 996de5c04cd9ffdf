"""Standard Delta Lake deletion-vector (de)serialization.

Implements the PUBLIC Delta protocol deletion-vector format
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md#deletion-vectors
and #deletion-vector-format) with no delta-spark dependency:

- Z85 codec (the ZeroMQ base-85 alphabet the protocol specifies) for
  inline DVs and for the UUID in ``u``-storage path encoding;
- 64-bit RoaringBitmapArray in the *portable* serialization format
  (magic 1681511377): ``long nBitmaps (LE)`` then per bitmap
  ``int key (LE)`` + a standard 32-bit roaring bitmap in the
  interoperable format of https://github.com/RoaringBitmap/RoaringFormatSpec;
- the on-disk DV file layout: 1 version byte, then per stored vector
  ``int dataSize (BE) | data | int crc32(data) (BE)`` — the descriptor's
  ``offset`` points at the dataSize word and ``sizeInBytes`` is
  ``len(data)``.

Everything here is DRIVER-side metadata work, like every Delta client's
DV path: a descriptor decodes to a sorted array of deleted row indexes
for ONE data file (cardinality bounded by rows-per-file; tables where
DVs grow large are expected to purge/OPTIMIZE). The distributed part —
filtering scanned rows by ``_metadata.row_index`` — lives in the
readers, not here.

Round-trip safety: ``deserialize_roaring_array(serialize_roaring_array(x))
== x`` is property-tested in tests/test_deltareader.py, and the reader
verifies the stored CRC32 + cardinality before trusting any vector.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC_PORTABLE = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096


# ------------------------------------------------------------------ Z85

def z85_encode(data: bytes) -> str:
    """Z85 of ``data`` padded with zero bytes to a multiple of 4 (the
    protocol decodes with an explicit byte length, so padding is safe)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, n_bytes: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            n = n * 85 + _Z85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out if n_bytes is None else out[:n_bytes])


def encode_uuid(u: _uuid.UUID) -> str:
    return z85_encode(u.bytes)


def decode_uuid(text20: str) -> _uuid.UUID:
    return _uuid.UUID(bytes=z85_decode(text20))


# --------------------------------------------- 32-bit roaring (portable)

def _serialize_rb32(values: list[int]) -> bytes:
    """One 32-bit roaring bitmap, portable format, no run containers
    (always legal; readers pick container type from the header)."""
    containers: list[tuple[int, list[int]]] = []
    for v in values:  # values sorted ascending
        key, low = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == key:
            containers[-1][1].append(low)
        else:
            containers.append((key, [low]))
    n = len(containers)
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    descr = b"".join(struct.pack("<HH", key, len(lows) - 1)
                     for key, lows in containers)
    bodies: list[bytes] = []
    for _key, lows in containers:
        if len(lows) > _ARRAY_MAX_CARD:
            bits = bytearray(8192)
            for low in lows:
                bits[low >> 3] |= 1 << (low & 7)
            bodies.append(bytes(bits))
        else:
            bodies.append(struct.pack(f"<{len(lows)}H", *lows))
    # offset header: byte position of each container from stream start
    pos = len(header) + len(descr) + 4 * n
    offsets = []
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    return b"".join([header,
                     descr,
                     struct.pack(f"<{n}I", *offsets) if n else b"",
                     *bodies])


def _deserialize_rb32(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit roaring bitmap at ``pos``; returns (values,
    next position). Handles array/bitmap/run containers."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags = b""
    if cookie & 0xFFFF == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        flag_len = (n + 7) // 8
        run_flags = bytes(buf[pos + 4:pos + 4 + flag_len])
        p = pos + 4 + flag_len
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        p = pos + 8
        has_offsets = True
    else:
        raise ValueError(f"unrecognized roaring cookie {cookie}")
    keys_cards = struct.unpack_from(f"<{2 * n}H", buf, p)
    p += 4 * n
    if has_offsets:
        p += 4 * n  # containers are sequential; offsets are redundant
    values: list[int] = []
    for i in range(n):
        key, card = keys_cards[2 * i], keys_cards[2 * i + 1] + 1
        base = key << 16
        is_run = bool(run_flags[i >> 3] & (1 << (i & 7))) if run_flags else False
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, p)
            p += 4 * n_runs
            for j in range(n_runs):
                start, length = runs[2 * j], runs[2 * j + 1] + 1
                values.extend(range(base + start, base + start + length))
        elif card > _ARRAY_MAX_CARD:
            chunk = bytes(buf[p:p + 8192])
            p += 8192
            for byte_i, byte in enumerate(chunk):
                while byte:
                    bit = byte & -byte
                    values.append(base + (byte_i << 3)
                                  + bit.bit_length() - 1)
                    byte ^= bit
        else:
            lows = struct.unpack_from(f"<{card}H", buf, p)
            p += 2 * card
            values.extend(base + low for low in lows)
    return values, p


# ------------------------------------------- 64-bit array (magic + data)

def serialize_roaring_array(positions: list[int]) -> bytes:
    """Sorted 64-bit row indexes -> portable RoaringBitmapArray bytes
    (the ``data`` of the protocol: LE magic, LE long count, then per
    non-empty high-32 key an LE int key + 32-bit bitmap)."""
    positions = sorted(positions)
    groups: list[tuple[int, list[int]]] = []
    for v in positions:
        if v < 0 or v >= 1 << 63:
            raise ValueError(f"row index out of range: {v}")
        key, low = v >> 32, v & 0xFFFFFFFF
        if groups and groups[-1][0] == key:
            groups[-1][1].append(low)
        else:
            groups.append((key, [low]))
    parts = [struct.pack("<iq", MAGIC_PORTABLE, len(groups))]
    for key, lows in groups:
        parts.append(struct.pack("<i", key))
        parts.append(_serialize_rb32(lows))
    return b"".join(parts)


def deserialize_roaring_array(data: bytes) -> list[int]:
    buf = memoryview(data)
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != MAGIC_PORTABLE:
        raise ValueError(
            f"unsupported RoaringBitmapArray magic {magic} "
            f"(only the portable format {MAGIC_PORTABLE} is implemented)")
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", buf, pos)
        values, pos = _deserialize_rb32(buf, pos + 4)
        base = key << 32
        out.extend(base + v for v in values)
    return out


# --------------------------------------------------- descriptor storage

def dv_relative_path(path_or_inline: str) -> str:
    """``u``-storage: the trailing 20 chars are the Z85 UUID, anything
    before them is an optional random path prefix."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    name = f"deletion_vector_{decode_uuid(enc)}.bin"
    return os.path.join(prefix, name) if prefix else name


def read_descriptor(table_root: str, descriptor: dict) -> list[int]:
    """Descriptor dict (the ``deletionVector`` field of an add/remove
    action) -> sorted deleted row indexes, CRC- and cardinality-checked."""
    storage = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if storage == "i":
        data = z85_decode(descriptor["pathOrInlineDv"], size)
    elif storage in ("u", "p"):
        if storage == "u":
            path = os.path.join(table_root,
                                dv_relative_path(descriptor["pathOrInlineDv"]))
        else:
            path = descriptor["pathOrInlineDv"]
            if path.startswith("file:"):
                path = path[len("file:"):]
        offset = int(descriptor.get("offset") or 0)
        with open(path, "rb") as fh:
            fh.seek(offset)
            (stored_size,) = struct.unpack(">i", fh.read(4))
            if stored_size != size:
                raise ValueError(
                    f"DV size mismatch at {path}:{offset}: "
                    f"stored {stored_size} != descriptor {size}")
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    else:
        raise ValueError(f"unknown DV storageType {storage!r}")
    positions = deserialize_roaring_array(data)
    card = int(descriptor["cardinality"])
    if len(positions) != card:
        raise ValueError(
            f"DV cardinality mismatch: bitmap has {len(positions)} rows, "
            f"descriptor claims {card}")
    return positions


def write_dv_file(table_root: str, dvs: list[list[int]],
                  prefix: str = "") -> list[dict]:
    """Write one on-disk DV file holding every vector in ``dvs`` and
    return their ``u``-storage descriptors (delta-spark likewise packs
    all DVs of one commit into a single .bin). ``prefix`` optionally
    buckets the file into a subdirectory (the protocol's random-prefix
    layout for object-store key distribution)."""
    u = _uuid.uuid4()
    rel_dir = prefix or ""
    target_dir = os.path.join(table_root, rel_dir) if rel_dir else table_root
    os.makedirs(target_dir, exist_ok=True)
    path = os.path.join(target_dir, f"deletion_vector_{u}.bin")
    descriptors = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")  # format version
        offset = 1
        for positions in dvs:
            data = serialize_roaring_array(positions)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descriptors.append({
                "storageType": "u",
                "pathOrInlineDv": (prefix or "") + encode_uuid(u),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": len(positions),
            })
            offset += 4 + len(data) + 4
    return descriptors


def inline_descriptor(positions: list[int]) -> dict:
    data = serialize_roaring_array(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }
