"""Pure-numpy media codecs (no PIL/ffmpeg in this container).

Everything here is public-knowledge format work: baseline JPEG per
ITU-T T.81 (JFIF container, Annex K tables), PNG per RFC 2083 with
stdlib zlib. The codecs exist so the multimodal pipeline
(pipeline/multimodal.py) can decode REAL compressed payloads — the
reference's media path assumes a codec library on the worker
(SURVEY.md §2.10); here the decode is self-contained, which is also
the honest dependency story for a 1000-executor cluster (no
per-node native-lib rollout).

Decode cost model at 100 TB: decoding is embarrassingly parallel
per-row work with zero shuffle — it scales with executor count, not
data layout, and rides mapInPandas Arrow batches. The Python-loop
part of JPEG is the Huffman scan (inherently serial per image); the
DCT/color math is vectorized numpy over all blocks of an image at
once.
"""

from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from .png import decode_png, encode_png  # noqa: F401
