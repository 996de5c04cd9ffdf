"""JPEG (ITU-T T.81) codec in pure numpy — baseline AND progressive.

Public-knowledge implementation: JFIF container, sequential baseline
DCT (SOF0; SOF1 extended-sequential decodes on the same path),
progressive DCT (SOF2: spectral selection + successive approximation
per T.81 G.1/G.2, decode and encode, DC/AC refinement and EOB runs
included), Huffman entropy coding, Annex K quantization/Huffman
tables in the baseline encoder, restart-marker (DRI/RSTn) support,
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling on DECODE (the encoder
emits 4:4:4 and 4:2:0 only — passing subsampling='4:2:2' to
encode_jpeg raises). Arithmetic coding, 12-bit precision and CMYK
are rejected with clear errors.

Reference parity: the reference's media path hands compressed images
to a codec library on the worker and keeps (width, height, channels,
pixels) — this module supplies that decode natively so the Spark
pipeline (pipeline/multimodal.py) has no native-library deployment
story at 1000 executors.

Performance shape: the Huffman scan is an inherently serial per-image
Python loop, but each step is O(1) — a 65536-entry LUT maps the next
16 bits straight to (symbol, length) over a precomputed sliding
16-bit peek array, so no per-bit walk survives (measured ~5x decode
throughput vs the bit-walk; SCALE.md has the MB/s table). Everything
after the scan (dequantize, IDCT, upsample, color convert) is
vectorized numpy over ALL blocks of the image at once. Decode rides
mapInPandas Arrow batches — per-row parallel, zero shuffle.
"""

from __future__ import annotations

import struct
from collections import Counter
from functools import lru_cache

import numpy as np

# natural-order index of the k-th coefficient in zigzag order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_ZZ = ZIGZAG.tolist()  # plain-int copy for the scan hot loop

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


def _decode_table(bits: list[int], vals: list[int]) -> list[int]:
    """LUT decode table: 65536-entry plain-int list mapping the NEXT
    16 bits of the stream to ``(symbol << 5) | code_length`` (-1 where
    no code matches). Huffman codes are prefix-free and <= 16 bits, so
    one list index replaces the per-bit tree walk — the walk was ~93%
    of decode wall time (see SCALE.md codec throughput)."""
    return _decode_table_cached(tuple(bits), tuple(vals))


@lru_cache(maxsize=64)
def _decode_table_cached(bits: tuple, vals: tuple) -> list[int]:
    # cached on table CONTENT: corpora overwhelmingly reuse a handful
    # of Huffman tables (Annex K above all), and building + listifying
    # 65536 entries per IMAGE dominated tiny-image decode (measured
    # 2.4 -> 4.0 s on the sf0.1 gate of 8-24 px images before this
    # cache). A worker process pays each distinct table once.
    lut = np.full(1 << 16, -1, dtype=np.int32)
    for sym, (code, ln) in _canonical_codes(list(bits), list(vals)).items():
        base = code << (16 - ln)
        lut[base:base + (1 << (16 - ln))] = (sym << 5) | ln
    return lut.tolist()


# --------------------------------------------------------------- decode

class _BitReader:
    """MSB-first reader over an unstuffed entropy segment, built for
    LUT Huffman decode: ``peek16[i]`` holds bits i..i+15 as one
    integer (16 vectorized shift-adds at construction), so decode_huff
    is a single LUT index + position bump and receive is one shift —
    no per-bit Python loop anywhere (measured ~5x decode throughput
    vs the bit-walk; SCALE.md). Cost: 16 bytes of peek array per input
    byte, transient per image under mapInPandas."""

    # T.81 permits the encoder to end the entropy segment mid-block
    # when the remaining coefficients decode from padding; libjpeg
    # tolerates this by feeding 0-bits past the end. Allow a bounded
    # overrun (enough to finish the in-flight MCU) before declaring
    # the stream truly truncated — an unbounded 0-fill could spin a
    # corrupt Huffman walk forever.
    _ZERO_FILL_LIMIT = 512

    def __init__(self, segment: bytes):
        bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.n_bits = len(bits)
        self.limit = self.n_bits + self._ZERO_FILL_LIMIT
        ext = np.zeros(self.limit + 16, dtype=np.uint16)
        ext[:self.n_bits] = bits
        peek = np.zeros(self.limit, dtype=np.uint16)
        for j in range(16):
            peek += ext[j:j + self.limit] << (15 - j)
        # a plain-int list: hot-loop indexing skips numpy scalar boxing
        # (~3x on the scan; the list is per-image transient)
        self.peek16 = peek.tolist()
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= self.limit:
            raise EOFError("entropy segment exhausted")
        b = self.peek16[self.pos] >> 15
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.limit:
            raise EOFError("entropy segment exhausted")
        v = 0
        while n > 16:  # unreachable for conformant streams (s <= 16)
            v = (v << 16) | self.peek16[self.pos]
            self.pos += 16
            n -= 16
        v = (v << n) | (self.peek16[self.pos] >> (16 - n))
        self.pos += n
        return v

    def decode_huff(self, table) -> int:
        if self.pos >= self.limit:
            raise EOFError("entropy segment exhausted")
        e = table[self.peek16[self.pos]]
        if e < 0:
            raise ValueError("invalid Huffman code in entropy stream")
        ln = e & 31
        if self.pos + ln > self.limit:
            raise EOFError("entropy segment exhausted")
        self.pos += ln
        return e >> 5

    def decode_block(self, dc_lut: list, ac_lut: list, pred: int):
        """One full baseline 8x8 block — DC diff + AC run-length loop
        fused into a single method whose state lives in locals (the
        per-coefficient method-call overhead WAS the decode
        bottleneck once the bit-walk went LUT). Returns (64-int list
        in natural order, new DC predictor). Semantics are exactly
        decode_huff/receive/_extend composed per T.81 F.2."""
        peek = self.peek16
        pos = self.pos
        limit = self.limit
        zz = _ZZ
        blk = [0] * 64
        if pos >= limit:
            raise EOFError("entropy segment exhausted")
        e = dc_lut[peek[pos]]
        if e < 0:
            raise ValueError("invalid Huffman code in entropy stream")
        pos += e & 31
        s = e >> 5
        if s:
            if pos + s > limit:
                raise EOFError("entropy segment exhausted")
            v = peek[pos] >> (16 - s)
            pos += s
            pred += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        elif pos > limit:
            raise EOFError("entropy segment exhausted")
        blk[0] = pred
        k = 1
        while k < 64:
            if pos >= limit:
                raise EOFError("entropy segment exhausted")
            e = ac_lut[peek[pos]]
            if e < 0:
                raise ValueError("invalid Huffman code in entropy stream")
            pos += e & 31
            if pos > limit:
                raise EOFError("entropy segment exhausted")
            rs = e >> 5
            s = rs & 15
            if s == 0:
                if rs >> 4 == 15:
                    k += 16
                    continue
                break  # EOB
            k += rs >> 4
            if k > 63:
                raise ValueError("AC index overrun")
            if pos + s > limit:
                raise EOFError("entropy segment exhausted")
            v = peek[pos] >> (16 - s)
            pos += s
            blk[zz[k]] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            k += 1
        self.pos = pos
        return blk, pred


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff (FF 00 -> FF) and split on RSTn markers. Returns the
    list of entropy segments (one per restart interval) and the offset
    of the terminating marker's 0xFF byte.

    Vectorized on the 0xFF positions: plain entropy bytes are bulk
    slices between markers (a stuffed FF is ~1/256 of bytes, so the
    Python loop runs per MARKER, not per byte — the per-byte bytearray
    walk was a measurable slice of decode wall time)."""
    n = len(data)
    ff_pos = (np.flatnonzero(
        np.frombuffer(data, np.uint8)[start:] == 0xFF) + start).tolist()
    segs: list[bytes] = []
    parts: list[bytes] = []
    i = start
    for p in ff_pos:
        if p < i:  # second byte of an already-consumed marker pair
            continue
        nxt = data[p + 1] if p + 1 < n else 0xD9
        if nxt == 0x00:              # stuffed FF: keep it, drop the 00
            parts.append(data[i:p + 1])
            i = p + 2
        elif 0xD0 <= nxt <= 0xD7:    # RSTn: close the segment
            parts.append(data[i:p])
            segs.append(b"".join(parts))
            parts = []
            i = p + 2
        else:                        # terminating marker
            parts.append(data[i:p])
            segs.append(b"".join(parts))
            return segs, p
    parts.append(data[i:n])          # ran off the end (no marker)
    segs.append(b"".join(parts))
    return segs, n


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to uint8 pixels: (h, w) grayscale or
    (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    scans: list[dict] = []
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
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
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(
                f"JPEG frame type 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            order, scan = [], {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                order.append(cid)
                scan[cid] = (tt >> 4, tt & 15)  # (dc table, ac table)
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            segs, end = _split_entropy(data, i)
            if not frame["progressive"]:
                # baseline: exactly one scan, then done
                return _decode_scan(frame, scan, qtables, htables, segs,
                                    restart_interval)
            scans.append({"order": order, "tables": scan,
                          "ss": ss, "se": se,
                          "ah": ahal >> 4, "al": ahal & 15,
                          "segs": segs, "ri": restart_interval,
                          # DHT may be redefined between scans
                          "ht": dict(htables)})
            i = end
        # APPn/COM/others: skipped
    if frame is not None and frame["progressive"] and scans:
        return _decode_progressive(frame, scans, qtables)
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
    for c in comps:  # LUTs are plain-int lists already (cached)
        c["dc_lut"] = htables[(0, c["dct"])]
        c["ac_lut"] = htables[(1, c["act"])]
    seg_iter = iter(segs)
    reader = _BitReader(next(seg_iter))
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk, pred[c["id"]] = reader.decode_block(
                            c["dc_lut"], c["ac_lut"], pred[c["id"]])
                        row = (my * c["v"] + v) * c["bx"] + (mx * c["h"] + hh)
                        c["coef"][row] = blk
            mcu += 1
    return _finish(frame, qtables)


def _finish(frame, qtables):
    """Vectorized tail shared by baseline and progressive paths:
    dequantize + IDCT + reassemble + upsample + color convert."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        blocks = (c["coef"] * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        # batched BLAS form of einsum("ux,nuv,vy->nxy") — 14x faster
        # for 8x8 panels (IEEE sums reassociate by ulps only; the
        # round+clip below is far from any boundary that could flip)
        spatial = (_DCT.T @ blocks) @ _DCT
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


def _decode_progressive(frame, scans, qtables):
    """Progressive (SOF2) reconstruction per T.81 G.2: every scan
    deposits a spectral band (Ss..Se) at a bit position (successive
    approximation Ah/Al) into per-component coefficient grids; the
    shared _finish runs once at the end. DC scans may interleave all
    components (MCU order); AC scans are single-component in that
    component's own raster block order. The EOB run and the AC
    refinement correction-bit walk follow the spec's decode
    procedures."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {}
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        # non-interleaved scans cover only the REAL block grid of the
        # component (ceil of its sample dims / 8), not the MCU-padded
        # grid
        sw = -(-(w * c["h"]) // hmax)
        sh = -(-(h * c["v"]) // vmax)
        c["wb"] = -(-sw // 8)
        c["hb"] = -(-sh // 8)
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int64)
        by_id[c["id"]] = c

    for sc in scans:
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        ht, ri = sc["ht"], sc["ri"]  # LUTs are plain-int lists (cached)
        seg_iter = iter(sc["segs"])
        reader = _BitReader(next(seg_iter))
        state = {"eobrun": 0,
                 "pred": {cid: 0 for cid in sc["order"]}}

        def restart():
            nonlocal reader
            reader = _BitReader(next(seg_iter))
            state["eobrun"] = 0
            state["pred"] = {cid: 0 for cid in sc["order"]}

        if ss == 0:
            # DC scan (se must be 0): interleaved over all scan comps
            if se != 0:
                raise ValueError("DC progressive scan with Se != 0")
            unit = 0
            if len(sc["order"]) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        if ri and unit and unit % ri == 0:
                            restart()
                        unit += 1
                        for cid in sc["order"]:
                            c = by_id[cid]
                            for v in range(c["v"]):
                                for hh in range(c["h"]):
                                    row = ((my * c["v"] + v) * c["bx"]
                                           + mx * c["h"] + hh)
                                    _dc_unit(reader, ht, sc, c, row,
                                             state, ah, al)
            else:
                c = by_id[sc["order"][0]]
                for byy in range(c["hb"]):
                    for bxx in range(c["wb"]):
                        if ri and unit and unit % ri == 0:
                            restart()
                        unit += 1
                        _dc_unit(reader, ht, sc, c,
                                 byy * c["bx"] + bxx, state, ah, al)
        else:
            # AC scan: single component, raster order over ITS blocks
            if len(sc["order"]) != 1:
                raise ValueError("interleaved AC progressive scan")
            c = by_id[sc["order"][0]]
            ac_t = ht.get((1, sc["tables"][c["id"]][1]))
            unit = 0
            for byy in range(c["hb"]):
                for bxx in range(c["wb"]):
                    if ri and unit and unit % ri == 0:
                        restart()
                    unit += 1
                    blk = c["coef"][byy * c["bx"] + bxx]
                    if ah == 0:
                        _ac_first(reader, ac_t, blk, ss, se, al, state)
                    else:
                        _ac_refine(reader, ac_t, blk, ss, se, al, state)
    return _finish(frame, qtables)


def _dc_unit(reader, ht, sc, c, row, state, ah, al):
    blk = c["coef"][row]
    if ah == 0:
        dc_t = ht.get((0, sc["tables"][c["id"]][0]))
        s = reader.decode_huff(dc_t)
        diff = _extend(reader.receive(s), s) if s else 0
        state["pred"][c["id"]] += diff
        blk[0] = state["pred"][c["id"]] << al
    else:
        if reader.receive(1):
            blk[0] |= 1 << al


def _ac_first(reader, ac_t, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC band overrun in progressive scan")
        blk[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine(reader, ac_t, blk, ss, se, al, state):
    """T.81 G.2.2 AC successive-approximation refinement: correction
    bits for already-nonzero coefficients, newly significant
    coefficients of magnitude 1 placed at run ends. An EOBn covers
    (1<<r)+bits blocks INCLUDING the current one, whose remaining
    nonzero-history coefficients still carry correction bits — the
    tail walk below must run even for EOB0."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.receive(r)
                    break
                # r == 15: skip 16 ZERO-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad magnitude in AC refinement")
                val = p1 if reader.receive(1) else m1
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    if reader.receive(1) and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[z] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                if reader.receive(1) and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


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


# the Annex K encode tables are constants — build their canonical
# code maps once at import instead of per encode_jpeg call
_ENC_LUMA = (_canonical_codes(*DC_LUMA), _canonical_codes(*AC_LUMA))
_ENC_CHROMA = (_canonical_codes(*DC_CHROMA), _canonical_codes(*AC_CHROMA))


def _enc_arrays(codes: dict, size: int) -> tuple[np.ndarray, np.ndarray]:
    """(code, length) dict -> dense int64 lookup arrays indexed by
    symbol, for the vectorized emitter (unassigned symbols stay 0/0 —
    they can never be produced by a legal run/size pair)."""
    code = np.zeros(size, dtype=np.int64)
    ln = np.zeros(size, dtype=np.int64)
    for sym, (c, l) in codes.items():
        code[sym] = c
        ln[sym] = l
    return code, ln


_ENC_LUMA_ARR = (*_enc_arrays(_ENC_LUMA[0], 16), *_enc_arrays(_ENC_LUMA[1], 256))
_ENC_CHROMA_ARR = (*_enc_arrays(_ENC_CHROMA[0], 16),
                   *_enc_arrays(_ENC_CHROMA[1], 256))
# row 0 = luma, row 1 = chroma: one fancy lookup covers every block of
# an interleaved scan, so the whole image is a SINGLE token pass
_ENC_DC_CODE = np.stack([_ENC_LUMA_ARR[0], _ENC_CHROMA_ARR[0]])
_ENC_DC_LEN = np.stack([_ENC_LUMA_ARR[1], _ENC_CHROMA_ARR[1]])
_ENC_AC_CODE = np.stack([_ENC_LUMA_ARR[2], _ENC_CHROMA_ARR[2]])
_ENC_AC_LEN = np.stack([_ENC_LUMA_ARR[3], _ENC_CHROMA_ARR[3]])
# magnitude-category boundaries: searchsorted(right) of |v| over
# [1,2,4,...] is exactly v.bit_length(), integer-exact (no log2)
_MAG_BOUNDS = np.left_shift(np.int64(1), np.arange(17, dtype=np.int64))


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    if base is QUANT_LUMA or base is QUANT_CHROMA:
        # an encode-heavy worker pays the scale math once per
        # (Annex K table, quality); callers never mutate the result
        return _scaled_q_cached(base is QUANT_LUMA, quality)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


@lru_cache(maxsize=64)
def _scaled_q_cached(luma: bool, quality: int) -> np.ndarray:
    base = QUANT_LUMA if luma else QUANT_CHROMA
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
    # batched BLAS form of einsum("ux,nxy,vy->nuv"), see _finish
    coef = ((_DCT @ blocks) @ _DCT.T).reshape(-1, 64)
    # np.rint == np.round at 0 decimals (half-to-even), minus the
    # python-level wrapper cost that shows on tiny images
    return np.rint(coef / q[None, :].astype(np.float64)).astype(np.int64)


def _mag(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _entropy_tokens(zz: np.ndarray, gpos: np.ndarray, reset: np.ndarray,
                    tbl: np.ndarray) -> tuple:
    """Vectorized baseline entropy coding of an ENTIRE interleaved
    scan in one pass: turn (n, 64) ZIGZAG-ordered quantized blocks
    (all components, each component's blocks contiguous in its own
    scan order) into Huffman token arrays — the decoder's LUT trick
    applied in reverse, per the round-8 plan. ``tbl`` selects the
    Huffman table row per block (0 luma / 1 chroma), so one fancy
    lookup serves both. Each token is (key, value, nbits): value
    packs the Huffman code and the T.81 magnitude extra bits
    ((code << s) | extra, <= 26 bits), key = (global interleaved
    block position << 8) | within-block sequence, so one stable sort
    reproduces the serial MCU walk exactly. Per-block sequence: DC at
    0, the j-th nonzero AC's ZRLs then itself at 1 + S_j .. 1 + S_j +
    zrl_j (S_j = segmented cumsum of earlier token counts, < 67 total
    so 8 bits suffice), EOB pinned at 255. ``reset`` marks blocks
    whose DC prediction restarts (each component's first block and
    the first block of the component after an RSTn)."""
    n = zz.shape[0]
    # DC: differential, magnitude category via exact searchsorted
    dc = zz[:, 0]
    prev = np.empty_like(dc)
    prev[0] = 0
    prev[1:] = dc[:-1]
    prev[reset] = 0
    diff = dc - prev
    s = np.searchsorted(_MAG_BOUNDS, np.abs(diff), side="right")
    extra = np.where(diff >= 0, diff, diff + (np.int64(1) << s) - 1)
    dc_vals = (_ENC_DC_CODE[tbl, s] << s) | extra
    dc_lens = _ENC_DC_LEN[tbl, s] + s
    dc_keys = gpos << 8

    # AC: nonzeros in (block, ascending zigzag) order = scan order
    ac = zz[:, 1:]
    b, kz = np.nonzero(ac)
    keys = [dc_keys]
    vals = [dc_vals]
    lens = [dc_lens]
    if len(b):
        v = ac[b, kz]
        tb = tbl[b]
        first = np.empty(len(b), dtype=bool)
        first[0] = True
        first[1:] = b[1:] != b[:-1]
        prevpos = np.empty(len(b), dtype=np.int64)
        prevpos[0] = 0
        prevpos[1:] = kz[:-1] + 1
        prevpos[first] = 0
        run = kz - prevpos          # zeros between this and previous nonzero
        nzrl = run >> 4             # emitted (15,0) ZRL symbols
        s = np.searchsorted(_MAG_BOUNDS, np.abs(v), side="right")
        sym = ((run & 15) << 4) | s
        extra = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
        g = nzrl + 1                # tokens this nonzero contributes
        cg = np.cumsum(g)
        excl = cg - g
        start = excl[first]
        S = excl - start[np.cumsum(first) - 1]
        keys.append((gpos[b] << 8) | (1 + S + nzrl))
        vals.append((_ENC_AC_CODE[tb, sym] << s) | extra)
        lens.append(_ENC_AC_LEN[tb, sym] + s)
        tot = int(nzrl.sum())
        if tot:
            parent = np.repeat(np.arange(len(b)), nzrl)
            cnz = np.cumsum(nzrl)
            w = np.arange(tot) - np.repeat(cnz - nzrl, nzrl)
            tp = tb[parent]
            keys.append((gpos[b[parent]] << 8) | (1 + S[parent] + w))
            vals.append(_ENC_AC_CODE[tp, 0xF0])
            lens.append(_ENC_AC_LEN[tp, 0xF0])
    # EOB wherever the last nonzero sits before position 63 (duplicate
    # fancy assignment keeps the last write — kz ascends per block)
    lastk = np.zeros(n, dtype=np.int64)
    if len(b):
        lastk[b] = kz + 1
    eob = np.flatnonzero(lastk < 63)
    te = tbl[eob]
    keys.append((gpos[eob] << 8) | 255)
    vals.append(_ENC_AC_CODE[te, 0x00])
    lens.append(_ENC_AC_LEN[te, 0x00])
    return keys, vals, lens


def _pack_tokens(vals: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Pack variable-length big-endian tokens into a 1-padded,
    byte-stuffed uint8 array in one vectorized pass: expand each
    token to its individual bits (token index via repeat, bit index
    via a ragged arange), packbits, then np.insert a 0x00 after every
    0xFF (T.81 byte stuffing; markers are emitted outside)."""
    total = int(lens.sum())
    tok = np.repeat(np.arange(len(lens)), lens)
    off = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    bits = ((vals[tok] >> (lens[tok] - 1 - off)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    ff = np.flatnonzero(by == 0xFF)
    if len(ff):
        by = np.insert(by, ff + 1, np.uint8(0))
    return by


def _entropy_baseline(coefs, samp, mcux, mcuy, restart_interval) -> bytes:
    """Baseline scan body: tokenize every component (vectorized),
    stable-sort into the interleaved MCU order, bit-pack — with a
    per-restart-segment pack + RSTn when a DRI is requested (each
    entropy segment is independently 1-padded to a byte per T.81)."""
    bpm = sum(sh * sv for sh, sv in samp)
    zzs, gposs, resets, tbls = [], [], [], []
    off = 0
    for ci, (sh, sv) in enumerate(samp):
        spb = sh * sv
        nblk = mcux * mcuy * spb
        idx = np.arange(nblk)
        if spb == 1:
            raster = idx
            m = idx
            w = 0
        else:
            hh = idx % sh
            t = idx // sh
            vv = t % sv
            t //= sv
            mx = t % mcux
            my = t // mcux
            raster = (my * sv + vv) * (mcux * sh) + mx * sh + hh
            m = idx // spb
            w = idx % spb
        zzs.append(coefs[ci][raster[:, None], ZIGZAG[None, :]])
        gposs.append(m * bpm + off + w)
        # reset the DC chain at each component's first block (the
        # components are concatenated into ONE token pass) and at the
        # component's first block after every restart marker
        if restart_interval:
            reset = (m % restart_interval == 0)
            if spb > 1:
                reset &= w == 0
        else:
            reset = np.zeros(nblk, dtype=bool)
            reset[0] = True
        resets.append(reset)
        tbls.append(np.full(nblk, 0 if ci == 0 else 1, dtype=np.int64))
        off += spb
    k, v, l = _entropy_tokens(
        np.vstack(zzs), np.concatenate(gposs),
        np.concatenate(resets), np.concatenate(tbls))
    keys = np.concatenate(k)
    vals = np.concatenate(v)
    lens = np.concatenate(l)
    order = np.argsort(keys, kind="stable")
    vals, lens = vals[order], lens[order]
    if not restart_interval:
        return _pack_tokens(vals, lens).tobytes()
    seg = (keys[order] >> 8) // bpm // restart_interval
    cuts = np.flatnonzero(np.diff(seg)) + 1
    out = bytearray()
    for j, (v_s, l_s) in enumerate(zip(np.split(vals, cuts),
                                       np.split(lens, cuts))):
        if j:
            out += bytes([0xFF, 0xD0 + ((j - 1) % 8)])
        out += _pack_tokens(v_s, l_s).tobytes()
    return bytes(out)


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate pad to (bh, bw_) — four slice assignments
    instead of np.pad, whose generic machinery cost ~0.25 ms/image on
    the tiny-image gate corpus (4 calls per 4:2:0 encode)."""
    h, w = plane.shape
    if h == bh and w == bw_:
        return plane
    out = np.empty((bh, bw_), dtype=plane.dtype)
    out[:h, :w] = plane
    if bh > h:
        out[h:, :w] = plane[-1:, :]
    if bw_ > w:
        out[:, w:] = out[:, w - 1:w]
    return out


def _prep_coefs(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front end: color convert + subsample + forward
    DCT + quantize. Returns (gray, h, w, samp, mcux, mcuy, coefs,
    ql, qc) — coefs[ci] is (by*bx, 64) natural-order ints, blocks in
    raster order over the MCU-padded grid."""
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
    return gray, h, w, samp, mcux, mcuy, coefs, ql, qc


def _jfif_headers(gray: bool, h: int, w: int, samp, ql, qc,
                  sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOFn common to baseline and progressive."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (b"\xff\xdb" + struct.pack(">HB", 67, tid)
                + tbl[ZIGZAG].astype(np.uint8).tobytes())

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    return out


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as
    baseline JFIF. ``subsampling``: '4:4:4' or '4:2:0' (ignored for
    grayscale). ``restart_interval`` N > 0 emits a DRI segment and an
    RSTn marker every N MCUs (the error-resilience feature real
    encoders use on large images; also exercises the decoder's
    restart path)."""
    gray, h, w, samp, mcux, mcuy, coefs, ql, qc = \
        _prep_coefs(img, quality, subsampling)
    ncomp = 1 if gray else 3
    # fully vectorized entropy stage (r9): tokenize + stable-sort +
    # bit-pack in numpy — byte-identical to the retired per-block
    # Python loop on a 400-case matrix (gray/RGB x 4:4:4/4:2:0 x
    # DRI 0/1/2/5 x qualities), now pinned by the decode round-trip
    # and progressive==baseline gates
    entropy = _entropy_baseline(coefs, samp, mcux, mcuy, restart_interval)

    out = _jfif_headers(gray, h, w, samp, ql, qc, 0xC0)
    out += _dht(0, 0, DC_LUMA) + _dht(1, 0, AC_LUMA)
    if not gray:
        out += _dht(0, 1, DC_CHROMA) + _dht(1, 1, AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _dht(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


# -------------------------------------------------- progressive encode

def _flat_table(symbols) -> tuple[list[int], list[int]]:
    """Fixed-length canonical Huffman table over an emitted symbol
    set: every symbol gets length L with 2^L >= n+1 (the +1 reserves
    the all-1-bits code as T.81 requires, so 1-padding can never
    decode as a symbol). Valid and simple; compression is not the
    point of these streams — correctness vectors are."""
    syms = sorted(int(s) for s in symbols)
    n = len(syms)
    if not 0 < n <= 255:
        raise ValueError(f"bad symbol count {n}")
    ln = max(1, n.bit_length())
    bits = [0] * 16
    bits[ln - 1] = n
    return bits, syms


def _default_scan_script(ncomp: int) -> list[tuple]:
    """(component indices, Ss, Se, Ah, Al) — the classic spectral-
    selection + successive-approximation progression (the shape of
    cjpeg's default script): DC first at Al=1 then refined, luma AC
    split into a coarse 1..5 band and the tail, chroma AC in one
    band, all AC refined down to Al=0."""
    if ncomp == 1:
        return [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]


def _enc_dc_scan(blocks, coefs, ah, al, emit_sym, emit_bits):
    """DC progressive scan: first pass (Ah=0) Huffman-codes diffs of
    the point-transformed DC (arithmetic shift per T.81); refinement
    passes emit one raw bit per block."""
    pred: dict[int, int] = {}
    for ci, row in blocks:
        dc = int(coefs[ci][row, 0])
        if ah == 0:
            v = dc >> al
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s = _mag(diff)
            emit_sym(s)
            if s:
                emit_bits(diff if diff > 0 else diff + (1 << s) - 1, s)
        else:
            emit_bits((dc >> al) & 1, 1)


def _enc_ac_first(blocks, coefs, ss, se, al, emit_sym, emit_bits):
    """AC first pass (Ah=0) over one component's real block grid:
    run/size coding of the point-transformed band with cross-block
    EOB runs (EOBn covers (1<<r)+ext blocks including the current)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            emit_sym(r << 4)
            if r:
                emit_bits(eobrun - (1 << r), r)
            eobrun = 0

    zz = ZIGZAG[ss:se + 1]
    for ci, row in blocks:
        band = coefs[ci][row][zz]
        r = 0
        for v in band:
            v = int(v)
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush()
            while r > 15:
                emit_sym(0xF0)  # ZRL
                r -= 16
            s = t.bit_length()
            val = t if v > 0 else -t
            emit_sym((r << 4) | s)
            emit_bits(val if val > 0 else val + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(blocks, coefs, ss, se, al, emit_sym, emit_bits):
    """AC successive-approximation refinement (Ah=Al+1), the jcphuff
    structure: zero-history runs carry the run length, already-nonzero
    coefficients buffer one correction bit each (flushed right after
    the next emitted symbol, matching the decoder's in-walk reads),
    newly significant coefficients emit (r<<4)|1 plus a sign bit."""
    eobrun = 0
    pend: list[int] = []  # correction bits buffered across an EOB run

    def flush():
        nonlocal eobrun, pend
        if eobrun:
            r = eobrun.bit_length() - 1
            emit_sym(r << 4)
            if r:
                emit_bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in pend:
            emit_bits(b, 1)
        pend = []

    zz = ZIGZAG[ss:se + 1]
    for ci, row in blocks:
        band = [int(v) for v in coefs[ci][row][zz]]
        absv = [abs(v) >> al for v in band]
        eob = -1
        for idx, t in enumerate(absv):
            if t == 1:
                eob = idx
        r = 0
        br: list[int] = []  # correction bits of the current run
        for idx, (v, t) in enumerate(zip(band, absv)):
            if t == 0:
                r += 1
                continue
            while r > 15 and idx <= eob:
                flush()
                emit_sym(0xF0)
                r -= 16
                for b in br:
                    emit_bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            emit_sym((r << 4) | 1)
            emit_bits(1 if v > 0 else 0, 1)
            for b in br:
                emit_bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsampling: str = "4:4:4",
                            scans: list[tuple] | None = None) -> bytes:
    """Encode uint8 pixels as progressive (SOF2) JFIF per T.81 G.1:
    spectral selection + successive approximation, DC refinement
    included. The quantized coefficients are identical to
    encode_jpeg's, so decode_jpeg(progressive) == decode_jpeg(
    baseline) bit-for-bit — the equivalence the tests pin. Each scan
    carries its own fixed-length Huffman table (_flat_table) built
    from a counting pre-pass, so EOBn symbols are always codeable."""
    gray, h, w, samp, mcux, mcuy, coefs, ql, qc = \
        _prep_coefs(img, quality, subsampling)
    ncomp = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if scans is None:
        scans = _default_scan_script(ncomp)

    # per-component geometry: padded stride bx, real block grid wb/hb
    geo = []
    for (sh, sv) in samp:
        sw = -(-(w * sh) // hmax)
        sh_px = -(-(h * sv) // vmax)
        geo.append({"sh": sh, "sv": sv, "bx": mcux * sh,
                    "wb": -(-sw // 8), "hb": -(-sh_px // 8)})

    def dc_blocks(sel):
        if len(sel) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in sel:
                        g = geo[ci]
                        for v in range(g["sv"]):
                            for hh in range(g["sh"]):
                                yield ci, ((my * g["sv"] + v) * g["bx"]
                                           + mx * g["sh"] + hh)
        else:
            ci = sel[0]
            g = geo[ci]
            for byy in range(g["hb"]):
                for bxx in range(g["wb"]):
                    yield ci, byy * g["bx"] + bxx

    def ac_blocks(ci):
        g = geo[ci]
        for byy in range(g["hb"]):
            for bxx in range(g["wb"]):
                yield ci, byy * g["bx"] + bxx

    def run_scan(sel, ss, se, ah, al, emit_sym, emit_bits):
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            _enc_dc_scan(dc_blocks(sel), coefs, ah, al,
                         emit_sym, emit_bits)
        else:
            if len(sel) != 1:
                raise ValueError("AC scans are single-component")
            fn = _enc_ac_first if ah == 0 else _enc_ac_refine
            fn(ac_blocks(sel[0]), coefs, ss, se, al, emit_sym, emit_bits)

    out = _jfif_headers(gray, h, w, samp, ql, qc, 0xC2)
    for (sel, ss, se, ah, al) in scans:
        freq: Counter = Counter()
        run_scan(sel, ss, se, ah, al,
                 lambda s: freq.update((s,)), lambda v, n: None)
        tc = 0 if ss == 0 else 1
        if freq:
            spec = _flat_table(freq)
            out += _dht(tc, 0, spec)
            codes = _canonical_codes(*spec)
        else:
            codes = None  # DC refinement: raw bits only, no table
        bw = _BitWriter()
        run_scan(sel, ss, se, ah, al,
                 (lambda s: bw.write(*codes[s])) if codes
                 else (lambda s: None),
                 bw.write)
        bw.flush()
        sos = bytes([len(sel)])
        for ci in sel:
            sos += bytes([ci + 1, 0x00])  # Td=0, Ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += bw.out
    out += b"\xff\xd9"
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
