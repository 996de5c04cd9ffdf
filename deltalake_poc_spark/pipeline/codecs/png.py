"""PNG codec (RFC 2083) in pure numpy + stdlib zlib.

Decode supports 8-bit depth in all five color types (grayscale,
RGB, palette, gray+alpha, RGBA) and all five scanline filters
(None/Sub/Up/Average/Paeth); 1/2/4/16-bit depths and Adam7 interlace
are rejected with clear errors. Encode writes 8-bit gray/RGB/RGBA
with a selectable per-row filter (default Sub — cheap and effective
on gradients; the knob also lets tests exercise every reconstruction
path).

PNG is lossless, which is what makes it the multimodal ORACLE format
here: decode(encode(pixels)) == pixels exactly, so pixel statistics
of a decoded corpus are SQL-recomputable (see png_decode in
__spark_entry__.py). The filter reconstruction is a per-row loop
(rows are serially dependent by design); everything within a row is
vectorized numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a row (a=left, b=up,
    c=up-left), int16 inputs."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to uint8 pixels: (h, w) for grayscale, else
    (h, w, channels)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i, ihdr, idat, plte, trns = 8, None, bytearray(), None, None
    while i < len(data):
        (ln,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4:i + 8]
        body = data[i + 8:i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG unsupported")
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG unsupported")
    if comp or filt:
        raise ValueError("bad IHDR compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"bad color type {ctype}")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), np.int16)
    zero = np.zeros(stride, np.int16)
    for y in range(h):
        f, cur = int(ftypes[y]), rows[y]
        up = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + up) & 0xFF
        elif f == 1:  # Sub: a per-channel-lane PREFIX SUM — mod 256
            # commutes with addition, so one cumsum + final mask
            # replaces the serial chain (vectorized)
            out[y] = (np.cumsum(cur.reshape(-1, ch), axis=0,
                                dtype=np.int64).reshape(stride) & 0xFF)
        elif f in (3, 4):  # Average / Paeth: genuinely serial in x —
            # run the recurrence on plain ints (a per-pixel numpy
            # slice-and-where formulation measured ~10x slower)
            cur_l = cur.tolist()
            up_l = up.tolist()
            rec = [0] * stride
            if f == 3:
                for x in range(stride):
                    left = rec[x - ch] if x >= ch else 0
                    rec[x] = (cur_l[x] + ((left + up_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = rec[x - ch] if x >= ch else 0
                    ul = up_l[x - ch] if x >= ch else 0  # zero row up
                    b = up_l[x]
                    p = left + b - ul
                    pa = p - left
                    if pa < 0:
                        pa = -pa
                    pb = p - b
                    if pb < 0:
                        pb = -pb
                    pc = p - ul
                    if pc < 0:
                        pc = -pc
                    pred = (left if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else ul))
                    rec[x] = (cur_l[x] + pred) & 0xFF
            out[y] = rec
        else:
            raise ValueError(f"bad filter type {f} on row {y}")
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[..., 0]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([plte[idx], alpha[idx]])
        return plte[idx]
    return px[..., 0] if ch == 1 else px


def encode_png(img: np.ndarray, filter_type: int = 1) -> bytes:
    """Encode uint8 pixels — (h, w), (h, w, 3) or (h, w, 4) — as an
    8-bit PNG. ``filter_type`` 0-4 applies that filter to every row
    (tests use this to exercise each reconstruction path)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        ctype, ch = 0, 1
        img = img[..., None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    h, w = img.shape[:2]
    flat = img.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    zero = np.zeros(stride, np.int16)
    lines = bytearray()
    for y in range(h):
        cur = flat[y]
        up = flat[y - 1] if y else zero
        left = np.concatenate([zero[:ch], cur[:-ch]])
        ul = np.concatenate([zero[:ch], up[:-ch]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - up
        elif filter_type == 3:
            enc = cur - ((left + up) >> 1)
        else:
            enc = cur - _paeth(left, up, ul)
        lines.append(filter_type)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
            + _chunk(b"IEND", b""))


def png_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR only."""
    if data[:8] != _SIG or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, _, ctype = struct.unpack_from(">IIBB", data, 16)
    return w, h, _CHANNELS.get(ctype, 0)
