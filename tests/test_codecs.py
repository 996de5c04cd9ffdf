"""Pure-numpy media codecs (deltalake_poc_spark/pipeline/codecs).

The png_decode gate hash-matches decoded pixel statistics against a
DuckDB recomputation (lossless), and jpeg_decode self-certifies
PSNR in-worker; these tests pin the codec properties the gates
can't see: every PNG filter type reconstructs exactly, palette and
alpha color types decode, JPEG quality/subsampling trade off as
specified, restart markers round-trip, and malformed/unsupported
inputs reject loudly instead of mangling pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from deltalake_poc_spark.pipeline.codecs.jpeg import (
    decode_jpeg, encode_jpeg, jpeg_dimensions,
)
from deltalake_poc_spark.pipeline.codecs.png import (
    decode_png, encode_png, png_dimensions,
)
from deltalake_poc_spark.pipeline import multimodal


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient_rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    i, j = np.mgrid[0:h, 0:w]
    tri = lambda x: np.abs((x % 510) - 255).astype(np.uint8)  # noqa: E731
    return np.stack([tri(seed + i * 3 + j), tri(seed + i + j * 2),
                     tri(seed + i * 2 + j * 3)], -1)


# ------------------------------------------------------------------ JPEG

@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("dims", [(40, 56), (33, 47), (8, 8), (1, 1)])
def test_jpeg_roundtrip_rgb(sub, dims):
    img = _gradient_rgb(*dims, seed=7)
    enc = encode_jpeg(img, quality=85, subsampling=sub)
    assert jpeg_dimensions(enc) == (dims[1], dims[0], 3)
    dec = decode_jpeg(enc)
    assert dec.shape == img.shape
    assert _psnr(img, dec) >= (35 if min(dims) >= 8 else 25)


def test_jpeg_roundtrip_gray_odd_dims():
    i, j = np.mgrid[0:33, 0:47]
    g = np.abs(((i * 5 + j * 7) % 510) - 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (33, 47)
    assert _psnr(g, dec) >= 35


def test_jpeg_quality_monotonic():
    """Higher quality -> larger file AND higher fidelity."""
    img = _gradient_rgb(48, 48, seed=3)
    sizes, psnrs = [], []
    for q in (30, 60, 90):
        enc = encode_jpeg(img, quality=q)
        sizes.append(len(enc))
        psnrs.append(_psnr(img, decode_jpeg(enc)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_jpeg_subsampling_shrinks_file():
    img = _gradient_rgb(64, 64, seed=11)
    assert len(encode_jpeg(img, 85, "4:2:0")) < len(encode_jpeg(img, 85))


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: the encoder byte-aligns and resets DC prediction at
    every restart; the decoder must resynchronize identically. Pixels
    must match the no-restart encode's decode exactly (restarts change
    framing, not content)."""
    img = _gradient_rgb(48, 64, seed=5)
    enc_r = encode_jpeg(img, quality=85, restart_interval=2)
    enc_p = encode_jpeg(img, quality=85)
    assert b"\xff\xdd" in enc_r and b"\xff\xd0" in enc_r
    assert np.array_equal(decode_jpeg(enc_r), decode_jpeg(enc_p))


def test_jpeg_flat_image_near_exact():
    img = np.full((24, 24, 3), 200, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
    assert int(np.max(np.abs(dec.astype(int) - 200))) <= 2


def test_jpeg_rejects_malformed():
    img = np.zeros((8, 8), np.uint8)
    enc = bytearray(encode_jpeg(img))
    sof = enc.index(b"\xff\xc0")
    # flip SOF0 -> SOF2: the baseline scan header (Ss=0, Se=63) is
    # illegal as a progressive DC scan and must reject, not mangle
    enc[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), np.uint8))


# ------------------------------------------------- progressive JPEG

@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("dims", [(40, 56), (37, 29), (8, 8), (1, 1)])
def test_jpeg_progressive_bitexact_vs_baseline(sub, dims):
    """SOF2 spectral selection + successive approximation deposits
    the SAME quantized coefficients baseline encodes, so the decodes
    must match bit-for-bit — a far stronger gate than PSNR. (37, 29)
    at 4:2:0 exercises the non-interleaved real-block-grid path where
    the component grid is narrower than the MCU-padded grid."""
    from deltalake_poc_spark.pipeline.codecs.jpeg import (
        encode_jpeg_progressive,
    )
    img = _gradient_rgb(*dims, seed=dims[0])
    base = decode_jpeg(encode_jpeg(img, 85, sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, sub))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_noise_and_gray_bitexact():
    """Noise maximises refinement-scan activity: newly-significant
    coefficients mid-run, buffered correction bits, and EOB0 runs
    whose CURRENT block still carries correction bits — the T.81
    G.2.2 corner where eobrun must cover (1<<r)+ext blocks including
    the current one (a decode desyncs, not degrades, if that is off,
    so bit-equality here pins it)."""
    from deltalake_poc_spark.pipeline.codecs.jpeg import (
        encode_jpeg_progressive,
    )
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, (48, 40, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (37, 29)).astype(np.uint8)
    for img, sub in ((noise, "4:2:0"), (noise, "4:4:4"), (gray, "4:4:4")):
        for q in (30, 85):
            base = decode_jpeg(encode_jpeg(img, q, sub))
            prog = decode_jpeg(encode_jpeg_progressive(img, q, sub))
            assert np.array_equal(base, prog)


def test_jpeg_progressive_is_sof2_and_multiscan():
    from deltalake_poc_spark.pipeline.codecs.jpeg import (
        encode_jpeg_progressive, jpeg_dimensions,
    )
    img = _gradient_rgb(24, 24, seed=2)
    enc = encode_jpeg_progressive(img, 85)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == 10  # full scan script
    assert jpeg_dimensions(enc) == (24, 24, 3)


_REAL_PROGRESSIVE = (
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/f3.jpg")


@pytest.mark.skipif(not __import__("os").path.exists(_REAL_PROGRESSIVE),
                    reason="real progressive fixture not in container")
def test_jpeg_real_world_progressive_decodes():
    """Interop: a real 720x477 progressive JPEG produced by a real
    encoder (optimized Huffman tables, real scan script) must decode
    to plausible photographic content — nontrivial variance and no
    channel collapse. No pixel referee exists in this container; the
    synthetic bit-exactness tests above carry the correctness load."""
    from deltalake_poc_spark.pipeline.codecs.jpeg import jpeg_dimensions
    data = open(_REAL_PROGRESSIVE, "rb").read()
    assert jpeg_dimensions(data) == (720, 477, 3)
    px = decode_jpeg(data)
    assert px.shape == (477, 720, 3)
    assert 30 < float(px.std()) < 120
    means = px.mean(axis=(0, 1))
    assert all(20 < m < 235 for m in means)


# ------------------------------------------------------------------- PNG

@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_every_filter_lossless(ft):
    rng = np.random.RandomState(3 + ft)
    for img in (rng.randint(0, 256, (23, 31), dtype=np.uint8),
                rng.randint(0, 256, (23, 31, 3), dtype=np.uint8),
                rng.randint(0, 256, (23, 31, 4), dtype=np.uint8)):
        enc = encode_png(img, filter_type=ft)
        dec = decode_png(enc)
        assert np.array_equal(dec, img)
    one = np.array([[7]], np.uint8)
    assert np.array_equal(decode_png(encode_png(one, filter_type=ft)), one)


def test_png_dimensions_and_channels():
    img = np.zeros((5, 9, 3), np.uint8)
    assert png_dimensions(encode_png(img)) == (9, 5, 3)


def _raw_png(ihdr_fields, chunks):
    sig = b"\x89PNG\r\n\x1a\n"
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    out = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for tag, body in chunks:
        out += chunk(tag, body)
    return out + chunk(b"IEND", b"")


def test_png_palette_decode():
    """Color type 3: 2x2 image indexing a 3-entry palette."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = zlib.compress(bytes([0, 0, 1, 0, 2, 1]))  # rows: [0,1], [2,1]
    data = _raw_png((2, 2, 8, 3, 0, 0, 0),
                    [(b"PLTE", plte), (b"IDAT", scan)])
    dec = decode_png(data)
    assert dec.shape == (2, 2, 3)
    assert dec[0, 0].tolist() == [255, 0, 0]
    assert dec[1, 0].tolist() == [0, 0, 255]
    assert dec[0, 1].tolist() == dec[1, 1].tolist() == [0, 255, 0]


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    sixteen = _raw_png((2, 2, 16, 0, 0, 0, 0),
                       [(b"IDAT", zlib.compress(b"\x00" * 10))])
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(sixteen)
    interlaced = _raw_png((2, 2, 8, 0, 0, 0, 1),
                          [(b"IDAT", zlib.compress(b"\x00" * 6))])
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(interlaced)
    bad_filter = _raw_png((2, 1, 8, 0, 0, 0, 0),
                          [(b"IDAT", zlib.compress(bytes([9, 0, 0])))])
    with pytest.raises(ValueError, match="filter type"):
        decode_png(bad_filter)


# ------------------------------------------- multimodal pixel dispatch

def test_decode_pixels_dispatch_and_bmp_ppm():
    img = _gradient_rgb(10, 14, seed=9)
    px, fmt = multimodal.decode_pixels(encode_png(img))
    assert fmt == "png" and np.array_equal(px, img)
    px, fmt = multimodal.decode_pixels(encode_jpeg(img, 90))
    assert fmt == "jpeg" and px.shape == img.shape
    # binary PPM (P6)
    ppm = b"P6\n14 10\n255\n" + img.tobytes()
    px, fmt = multimodal.decode_pixels(ppm)
    assert fmt == "ppm" and np.array_equal(px, img)
    # 24-bit BMP, bottom-up rows padded to 4 bytes, BGR order
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 0, 0, 0, 0))
    px, fmt = multimodal.decode_pixels(header + rows)
    assert fmt == "bmp" and np.array_equal(px, img)


def test_decode_media_metadata_covers_jpeg_png(spark):
    img = _gradient_rgb(12, 20, seed=1)
    rows = [(1, "image", bytearray(encode_jpeg(img, 85))),
            (2, "image", bytearray(encode_png(img)))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           multimodal.decode_media(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) \
        == (20, 12, "jpeg")
    assert (got[2]["width"], got[2]["height"], got[2]["format"]) \
        == (20, 12, "png")


def _pattern_png(base: int, w: int, h: int, bump: bool = False) -> bytes:
    """Block-constant pseudorandom pattern (the image_neardup gate's
    formula minus its (r+c)%3 intra-block noise, so block means are
    EXACTLY resolution-independent here)."""
    r, c = np.mgrid[0:h, 0:w]
    bi, bj = (r * 8) // h, (c * 8) // w
    s = base * 64 + bi * 8 + bj + 1
    p = (s * s * 48271 % 1000003) % 200
    if bump:
        p = p + 40 * ((bi == 3) & (bj == 4))
    return encode_png(p.astype(np.uint8))


def test_image_dhash_resize_invariant(spark):
    """The point of a perceptual hash: the SAME pattern rendered at
    8x8, 16x16 and 24x16 must block-mean down to the same 8x8 grid
    comparisons -> identical dhash. A +40 bump on one interior block
    flips only the two comparisons that touch it -> hamming 1-2."""
    rows = [(0, bytearray(_pattern_png(5, 8, 8))),
            (1, bytearray(_pattern_png(5, 16, 16))),
            (2, bytearray(_pattern_png(5, 24, 16))),
            (3, bytearray(_pattern_png(5, 16, 8, bump=True))),
            (4, bytearray(_pattern_png(9, 16, 16)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["dhash"]
           for r in multimodal.image_dhash(media).collect()}
    assert got[0] == got[1] == got[2]
    bump_ham = bin(got[0] ^ got[3]).count("1")
    assert 1 <= bump_ham <= 2
    assert bin(got[0] ^ got[4]).count("1") > 6  # different base: far


def test_dhash_pairs_exact_vs_bruteforce(spark):
    """The 8-bit banding is pigeonhole-EXACT for hamming <= 6: the
    pair set must equal brute-force all-pairs popcount."""
    rng = np.random.RandomState(11)
    hashes = [int(x) for x in
              rng.randint(0, 1 << 56, size=40, dtype=np.uint64)]
    # plant near-dup clusters: copies of hash 0 with 0/1/6/7 flips
    hashes += [hashes[0], hashes[0] ^ 1, hashes[0] ^ 0b111111,
               hashes[0] ^ 0b1111111]
    df = spark.createDataFrame(
        [(i, h, 8, 8) for i, h in enumerate(hashes)],
        "media_id long, dhash long, width int, height int")
    got = {(r["media_a"], r["media_b"]): r["hamming"]
           for r in multimodal.dhash_pairs(df, max_hamming=6).collect()}
    want = {}
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            hm = bin(hashes[i] ^ hashes[j]).count("1")
            if hm <= 6:
                want[(i, j)] = hm
    assert got == want
    n = len(hashes)
    assert (0, n - 4) in got and got[(0, n - 4)] == 0
    assert got[(0, n - 2)] == 6
    assert (0, n - 1) not in got  # 7 flips > threshold
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.dhash_pairs(df, max_hamming=7)


def test_image_features_exact_for_png(spark):
    imgs = {i: _gradient_rgb(9 + i, 13 + i, seed=i) for i in range(4)}
    rows = [(i, bytearray(encode_png(img, filter_type=i % 5)))
            for i, img in imgs.items()]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           multimodal.image_features(media).collect()}
    for i, img in imgs.items():
        r = got[i]
        flat = img.reshape(-1).astype(np.int64)
        assert (r["width"], r["height"], r["channels"]) \
            == (img.shape[1], img.shape[0], 3)
        assert r["format"] == "png"
        assert r["n_px"] == flat.size
        assert r["sum_px"] == int(flat.sum())
        assert r["min_px"] == int(flat.min())
        assert r["max_px"] == int(flat.max())


# ------------------------------------------- MP4 / MP3 container index

def test_mp4_index_roundtrip_and_self_checks():
    from deltalake_poc_spark.pipeline.codecs.mp4 import (
        encode_mp4, mp4_index,
    )
    sizes = [((i * i * 7) % 900) + 100 for i in range(37)]
    data = encode_mp4(sizes, keyframe_every=5, delta=3003,
                      timescale=90000, width=320, height=180)
    x = mp4_index(data)
    assert x["n_samples"] == 37 and x["n_keyframes"] == 8
    assert (x["codec"], x["width"], x["height"]) == ("avc1", 320, 180)
    assert x["sample_sizes"] == sizes
    assert x["duration_ms"] == 37 * 3003 * 1000 // 90000
    assert x["sample_dts"] == [i * 3003 for i in range(37)]
    assert x["keyframes"] == list(range(0, 37, 5))
    offs = x["sample_offsets"]
    assert all(offs[i + 1] == offs[i] + sizes[i] for i in range(36))
    # the offsets index REAL bytes: sample i's payload is filler i%251
    assert data[offs[3]:offs[3] + 5] == bytes([3]) * 5
    # keyframe extraction = exactly what a frame sampler would slice
    k0 = x["keyframes"][1]
    assert data[offs[k0]:offs[k0] + sizes[k0]] == bytes([k0 % 251]) * sizes[k0]


def test_mp4_index_rejects_malformed():
    from deltalake_poc_spark.pipeline.codecs.mp4 import (
        encode_mp4, mp4_index,
    )
    data = encode_mp4([100, 200, 300], keyframe_every=2, delta=1000)
    with pytest.raises(ValueError, match="ftyp"):
        mp4_index(b"\x00\x00\x00\x08free" + data)
    with pytest.raises(ValueError):
        mp4_index(data[: len(data) // 2])  # moov truncated away
    # corrupt stsz sample count -> table cross-check must fire
    bad = bytearray(data)
    i = bad.index(b"stsz")
    struct.pack_into(">I", bad, i + 12, 99)
    with pytest.raises(ValueError):
        mp4_index(bytes(bad))


def test_mp3_index_synth_and_vbr():
    from deltalake_poc_spark.pipeline.codecs.mp3 import (
        encode_mp3_stream, mp3_index,
    )
    frames = [(br, 44100, i % 2)
              for i, br in enumerate([128, 160, 192, 128] * 6)]
    x = mp3_index(encode_mp3_stream(frames, id3_size=33))
    assert x["n_frames"] == 24 and x["vbr"]
    assert (x["min_kbps"], x["max_kbps"]) == (128, 192)
    assert x["duration_ms"] == 24 * 1152 * 1000 // 44100
    assert x["id3_bytes"] == 43
    cbr = mp3_index(encode_mp3_stream([(96, 32000, 0)] * 7))
    assert cbr["n_frames"] == 7 and not cbr["vbr"]
    assert cbr["samplerate"] == 32000
    with pytest.raises(ValueError, match="truncated"):
        mp3_index(encode_mp3_stream(frames)[:-3])
    with pytest.raises(ValueError):
        mp3_index(b"garbage not mpeg")


_REAL_MP3 = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
             "test_data/test.mp3")


@pytest.mark.skipif(not __import__("os").path.exists(_REAL_MP3),
                    reason="real mp3 fixture not in container")
def test_mp3_index_real_world_mpeg2():
    """Interop: a real MPEG-2 Layer III file (22.05 kHz, 64 kbps CBR,
    ID3v2 preamble) produced by a real encoder — the frame walk must
    consume every byte (each frame found exactly where the previous
    frame's computed length ends)."""
    from deltalake_poc_spark.pipeline.codecs.mp3 import mp3_index
    x = mp3_index(open(_REAL_MP3, "rb").read())
    assert x["n_frames"] == 45 and x["samplerate"] == 22050
    assert x["min_kbps"] == x["max_kbps"] == 64 and not x["vbr"]
    assert x["duration_ms"] == 45 * 576 * 1000 // 22050


def test_container_index_dispatch(spark):
    from deltalake_poc_spark.pipeline.codecs.mp3 import encode_mp3_stream
    from deltalake_poc_spark.pipeline.codecs.mp4 import encode_mp4

    rows = [
        (1, bytearray(encode_mp4([100] * 12, keyframe_every=3,
                                 delta=3000, width=128, height=72))),
        (2, bytearray(encode_mp3_stream([(128, 44100, 0)] * 9,
                                        id3_size=5))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           multimodal.container_index(media).collect()}
    v = got[1]
    assert (v["container"], v["codec"]) == ("mp4", "avc1")
    assert (v["n_units"], v["n_sync"]) == (12, 4)
    assert (v["width"], v["height"]) == (128, 72)
    assert v["duration_ms"] == 12 * 3000 * 1000 // 90000
    a = got[2]
    assert (a["container"], a["codec"]) == ("mp3", "mpeg-l3")
    assert a["n_units"] == a["n_sync"] == 9
    assert a["samplerate"] == 44100


def test_container_index_rejects_unknown_payload(spark):
    media = spark.createDataFrame(
        [(9, bytearray(b"definitely not a container"))],
        "media_id long, payload binary")
    with pytest.raises(Exception, match="unrecognized container"):
        multimodal.container_index(media).collect()


def test_bitreader_zero_fill_past_end():
    """T.81 tolerance: reads past the entropy segment 0-fill (bounded)
    instead of raising immediately — foreign baseline JPEGs whose last
    block relies on zero-fill past the padded final byte must decode.
    Beyond the bound the reader still fails loudly (truncation)."""
    from deltalake_poc_spark.pipeline.codecs.jpeg import _BitReader

    r = _BitReader(b"\xff")  # 8 one-bits
    assert [r.read_bit() for _ in range(8)] == [1] * 8
    # past-the-end: zero-fill
    assert r.read_bit() == 0
    assert r.receive(4) == 0
    # receive straddling the boundary zero-extends the real tail
    r2 = _BitReader(b"\xf0")
    assert r2.receive(6) == 0b111100
    assert r2.receive(4) == 0b0000  # 2 real zero bits + 2 fill bits
    r3 = _BitReader(b"\xff")
    assert r3.receive(12) == 0b111111110000
    # bounded: a run far past the segment still raises
    r4 = _BitReader(b"\x00")
    with pytest.raises(EOFError):
        for _ in range(8 + _BitReader._ZERO_FILL_LIMIT + 1):
            r4.read_bit()


def test_bmp_truncated_header_clean_error():
    """A 26-29 byte BMP (header cut before the bpp field) must hit the
    unrecognized-payload contract, not a struct.error."""
    bad = b"BM" + b"\x00" * 26  # 28 bytes: too short for bpp @ 28
    with pytest.raises(NotImplementedError, match="unrecognized"):
        multimodal.decode_pixels(bad)


def test_jpeg_vectorized_entropy_matches_reference_loop():
    """The r9 vectorized entropy stage (tokenize -> stable sort ->
    bit-pack) must be BYTE-identical to a straightforward serial
    per-block reference walk of T.81 F.1.2 — same canonical codes,
    same DC prediction, same ZRL/EOB decisions, same restart padding.
    The roundtrip tests above prove decodability; this pins the exact
    encoding (a merely-valid-but-different stream would silently
    change file sizes and progressive parity)."""
    from deltalake_poc_spark.pipeline.codecs.jpeg import (
        _BitWriter, _ENC_CHROMA, _ENC_LUMA, _entropy_baseline,
        _prep_coefs, ZIGZAG)

    def ref_block(bw, zzrow, pred, dc_codes, ac_codes):
        diff = zzrow[0] - pred
        s = diff.bit_length() if diff > 0 else (-diff).bit_length()
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        last = max((k for k in range(1, 64) if zzrow[k]), default=0)
        run = 0
        for k in range(1, last + 1):
            v = zzrow[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.write(*ac_codes[0xF0])
                run -= 16
            s = v.bit_length() if v > 0 else (-v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            bw.write(*ac_codes[0x00])
        return zzrow[0]

    def ref_entropy(coefs, samp, mcux, mcuy, ri, ncomp):
        zzl = [c[:, ZIGZAG].tolist() for c in coefs]
        bw = _BitWriter()
        pred = [0] * ncomp
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and mcu and mcu % ri == 0:
                    bw.marker(0xD0 + ((mcu // ri - 1) % 8))
                    pred = [0] * ncomp
                mcu += 1
                for ci, (sh, sv) in enumerate(samp):
                    dc_t, ac_t = _ENC_LUMA if ci == 0 else _ENC_CHROMA
                    for v in range(sv):
                        for hh in range(sh):
                            row = (my * sv + v) * mcux * sh + mx * sh + hh
                            pred[ci] = ref_block(bw, zzl[ci][row],
                                                 pred[ci], dc_t, ac_t)
        bw.flush()
        return bytes(bw.out)

    rs = np.random.RandomState(11)
    cases = 0
    for trial in range(12):
        h, w = rs.randint(1, 50), rs.randint(1, 50)
        gray = trial % 3 == 0
        img = rs.randint(0, 256,
                         (h, w) if gray else (h, w, 3)).astype(np.uint8)
        for sub in (["4:4:4"] if gray else ["4:4:4", "4:2:0"]):
            for ri in (0, 2):
                q = int(rs.choice([30, 85, 95]))
                g2, _, _, samp, mcux, mcuy, coefs, _, _ = \
                    _prep_coefs(img, q, sub)
                got = _entropy_baseline(coefs, samp, mcux, mcuy, ri)
                want = ref_entropy(coefs, samp, mcux, mcuy, ri,
                                   1 if g2 else 3)
                assert got == want, (h, w, gray, sub, ri, q)
                cases += 1
    assert cases >= 24
