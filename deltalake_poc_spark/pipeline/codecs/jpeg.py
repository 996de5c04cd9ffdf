"""Baseline JPEG (ITU-T T.81) codec in pure numpy.

Public-knowledge implementation: JFIF container, sequential baseline
DCT (SOF0; SOF1 extended-sequential decodes on the same path),
Huffman entropy coding, Annex K quantization/Huffman tables in the
encoder, restart-marker (DRI/RSTn) support in the decoder, 4:4:4 /
4:2:2 / 4:2:0 chroma subsampling. Progressive (SOF2), arithmetic
coding, 12-bit precision and CMYK are rejected with clear errors.

Reference parity: the reference's media path hands compressed images
to a codec library on the worker and keeps (width, height, channels,
pixels) — this module supplies that decode natively so the Spark
pipeline (pipeline/multimodal.py) has no native-library deployment
story at 1000 executors.

Performance shape: the Huffman scan is an inherently serial per-image
Python loop over a pre-unstuffed numpy bit array; everything after it
(dequantize, IDCT, upsample, color convert) is vectorized numpy over
ALL blocks of the image at once. Decode rides mapInPandas Arrow
batches — per-row parallel, zero shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# natural-order index of the k-th coefficient in zigzag order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K standard Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: M[u, x] = a(u) cos((2x+1)uπ/16).
    Forward: F = M @ f @ M.T; inverse: f = M.T @ F @ M."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= 0.5
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) with JPEG canonical code assignment."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# --------------------------------------------------------------- decode

class _BitReader:
    """MSB-first reader over an unstuffed entropy segment. The bits
    are pre-expanded with np.unpackbits (vectorized); only the Huffman
    walk itself is a Python loop."""

    def __init__(self, segment: bytes):
        self.bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            # past-the-end reads behave as 0-fill: some encoders pad
            # the final byte with 1-bits and rely on EOB having fired
            raise EOFError("entropy segment exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.bits):
            raise EOFError("entropy segment exhausted")
        chunk = self.bits[self.pos:end]
        self.pos = end
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff (FF 00 -> FF) and split on RSTn markers. Returns the
    list of entropy segments (one per restart interval) and the offset
    of the terminating marker's 0xFF byte."""
    segs, cur = [], bytearray()
    i, n = start, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to uint8 pixels: (h, w) grayscale or
    (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        body = data[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(body[j:j + 64], np.uint8).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(body[j:j + 128], ">u2").astype(np.int64)
                    j += 128
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = tbl  # DQT payload is in zigzag order
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG (CMYK?)")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) unsupported")
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(
                f"JPEG frame type 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — baseline: single scan, then done
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)  # (dc table, ac table)
            segs, _ = _split_entropy(data, i)
            return _decode_scan(frame, scan, qtables, htables, segs,
                                restart_interval)
        # APPn/COM/others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qtables, htables, segs, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int64)
        c["dct"], c["act"] = scan[c["id"]]
    pred = {c["id"]: 0 for c in comps}
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dc_t = htables[(0, c["dct"])]
                ac_t = htables[(1, c["act"])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, np.int64)
                        s = reader.decode_huff(dc_t)
                        diff = _extend(reader.receive(s), s) if s else 0
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            blk[ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
                        row = (my * c["v"] + v) * c["bx"] + (mx * c["h"] + hh)
                        c["coef"][row] = blk
            mcu += 1
    # vectorized tail: dequantize + IDCT + reassemble + upsample
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        blocks = (c["coef"] * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT)
        spatial = np.clip(np.round(spatial) + 128, 0, 255)
        plane = (spatial.reshape(c["by"], c["bx"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["by"] * 8, c["bx"] * 8))
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# --------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per T.81

    def marker(self, m: int):
        """Byte-align and emit a bare marker (RSTn) — markers are
        never byte-stuffed."""
        self.flush()
        self.out += bytes([0xFF, m])


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of a component plane
    (h, w multiples of 8). Returns (n_blocks, 64) int coefficients in
    natural order, blocks in raster order."""
    h, w = plane.shape
    blocks = (plane.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8)
              .astype(np.float64) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT).reshape(-1, 64)
    return np.round(coef / q[None, :].astype(np.float64)).astype(np.int64)


def _mag(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(blk[0])
    diff = dc - pred
    s = _mag(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bits = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(bits, s)
    zz = blk[ZIGZAG[1:]]
    run = 0
    nz = np.nonzero(zz)[0]
    last = nz[-1] if len(nz) else -1
    for k in range(last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bits = v if v > 0 else v + (1 << s) - 1
        bw.write(bits, s)
        run = 0
    if last < 62:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate pad to (bh, bw_)."""
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as
    baseline JFIF. ``subsampling``: '4:4:4' or '4:2:0' (ignored for
    grayscale). ``restart_interval`` N > 0 emits a DRI segment and an
    RSTn marker every N MCUs (the error-resilience feature real
    encoders use on large images; also exercises the decoder's
    restart path)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad image dims {h}x{w}")
    ql = _scaled_q(QUANT_LUMA, quality)
    qc = _scaled_q(QUANT_CHROMA, quality)
    if gray:
        planes = [np.clip(np.round(img), 0, 255)]
        samp = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsampling == "4:2:0":
            he, we = h + (h & 1), w + (w & 1)
            cbp = _pad_to(cb, he, we)
            crp = _pad_to(cr, he, we)
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cb, cr = np.round(cb), np.round(cr)
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for p, (sh, sv) in zip(planes, samp):
        bx, by = mcux * sh, mcuy * sv
        coefs.append(_fdct_quant(_pad_to(p, by * 8, bx * 8),
                                 ql if p is planes[0] else qc))
    dc_l, ac_l = (_canonical_codes(*DC_LUMA), _canonical_codes(*AC_LUMA))
    dc_c, ac_c = (_canonical_codes(*DC_CHROMA), _canonical_codes(*AC_CHROMA))
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.marker(0xD0 + ((mcu // restart_interval - 1) % 8))
                pred = [0] * len(planes)
            mcu += 1
            for ci, (sh, sv) in enumerate(samp):
                bxc = mcux * sh
                dct_c = dc_l if ci == 0 else dc_c
                act_c = ac_l if ci == 0 else ac_c
                for v in range(sv):
                    for hh in range(sh):
                        row = (my * sv + v) * bxc + (mx * sh + hh)
                        pred[ci] = _encode_block(
                            bw, coefs[ci][row], pred[ci], dct_c, act_c)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (b"\xff\xdb" + struct.pack(">HB", 67, tid)
                + bytes(int(x) for x in tbl[ZIGZAG]))

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
    if not gray:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF header only — the cheap
    metadata path (no entropy decode)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            raise ValueError("bad marker stream")
        marker = data[i + 1]
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        if marker in (0xC0, 0xC1, 0xC2):
            _, h, w, ncomp = struct.unpack_from(">BHHB", data, i + 4)
            return w, h, ncomp
        i += 2 + seglen
    raise ValueError("no SOF marker found")
