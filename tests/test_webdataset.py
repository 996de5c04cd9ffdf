"""WebDataset-style tar shards (deltalake_poc_spark/pipeline/webdataset.py).

The webdataset_rw gate oracles the SQL-derivable surface (member
counts, text sizes); these tests pin what the oracle can't see:
byte-level ustar validity (stdlib tarfile as an independent
referee), offset correctness for byte-range access, reproducibility
across partitionings, and loud rejection of corrupt shards.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from deltalake_poc_spark.pipeline import webdataset as W


def _sample_members():
    return [("000000.json", b'{"id": 0}'),
            ("000000.png", bytes(range(100))),
            ("000000.txt", b"hello world"),
            ("000001.json", b'{"id": 1}'),
            ("000001.txt", b"x" * 513)]  # forces multi-block padding


def test_pack_members_valid_for_stdlib_tarfile():
    """Our ustar writer must produce archives any tar reader
    accepts: stdlib tarfile is the referee."""
    tar = W.pack_members(_sample_members())
    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        got = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    assert got == dict(_sample_members())


def test_iter_members_offsets_enable_byte_range_reads():
    tar = W.pack_members(_sample_members())
    seen = {}
    for name, off, size in W.iter_members(tar):
        assert off % 512 == 0
        seen[name] = tar[off:off + size]
    assert seen == dict(_sample_members())


def test_iter_members_rejects_corruption():
    tar = bytearray(W.pack_members(_sample_members()))
    tar[10] ^= 0xFF  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        list(W.iter_members(bytes(tar)))
    clean = W.pack_members(_sample_members())
    with pytest.raises(ValueError, match="trailer|truncated"):
        list(W.iter_members(clean[:-1500]))  # cut the tail
    with pytest.raises(ValueError):
        W._tar_header("x" * 101, 1)


def test_pack_shards_roundtrip_and_determinism(spark):
    rows = [(i % 3, f"{i:06d}", f"text {i}".encode(),
             bytes([i]) * (i + 1)) for i in range(20)]
    schema = "shard int, key string, txt binary, png binary"
    samples = spark.createDataFrame(rows, schema)
    shards = W.pack_shards(samples).collect()
    assert len(shards) == 3
    assert all(r["n_samples"] in (6, 7) for r in shards)
    # reproducible: a different partitioning yields identical bytes
    again = {r["shard"]: bytes(r["tar"]) for r in
             W.pack_shards(samples.repartition(7)).collect()}
    assert {r["shard"]: bytes(r["tar"]) for r in shards} == again
    # roundtrip through the reader
    members = W.read_members(
        W.pack_shards(samples)).collect()
    got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in members}
    for shard, key, txt, png in rows:
        assert got[(key, "txt")] == txt
        assert got[(key, "png")] == png
    # grouped samples carry both parts
    grouped = W.group_samples(W.read_members(W.pack_shards(samples)))
    for r in grouped.collect():
        assert r["n_parts"] == 2
        assert set(r["parts"].keys()) == {"txt", "png"}


def test_pack_shards_skips_null_payloads(spark):
    rows = [(0, "a", b"t", None), (0, "b", b"u", b"img")]
    samples = spark.createDataFrame(
        rows, "shard int, key string, txt binary, png binary")
    members = W.read_members(W.pack_shards(samples)).collect()
    names = {(r["key"], r["ext"]) for r in members}
    assert names == {("a", "txt"), ("b", "txt"), ("b", "png")}
