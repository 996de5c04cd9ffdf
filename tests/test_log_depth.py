"""Commit-log replay at depth: a 5,000-commit log (one commit per
micro-batch for ~14 hours at a 10 s trigger) must stay O(checkpoint +
tail) to open, not O(all commits). Pure log-layer tests — no Spark —
so the pinned bounds measure the replay machinery itself.

Pins (work, not wall-time, so the bounds are deterministic):
- cold latest-snapshot reads <= CHECKPOINT_EVERY tail commits;
- cold timestampAsOf adds only O(log n) commit reads (binary search
  over the nondecreasing commit timestamps);
- without checkpoints the same open reads all n commits (the
  counterfactual that justifies the checkpoint cadence);
- results are identical with and without checkpoints.
One loose wall-clock ceiling guards against accidental quadratic
work inside the replay loop (5k commits replay fully in well under
five seconds even checkpoint-less).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from deltalake_poc_spark.tables.log import Commit, FileEntry, TableLog

DEPTH = 5_000


def _build_log(root: str, depth: int = DEPTH) -> TableLog:
    """Synthesize an append-mostly history: each commit adds one file;
    every 50th also removes the file from 40 commits earlier
    (compaction-like churn), so active-file state stays bounded while
    the history grows."""
    log = TableLog(root)
    os.makedirs(log.log_path, exist_ok=True)
    for v in range(depth):
        add = [FileEntry(f"data/f{v}.parquet", num_records=10,
                         stats={"id": [v, v + 9]})]
        remove = [f"data/f{v - 40}.parquet"] if (v % 50 == 0 and v >= 40) \
            else []
        log.write_commit(Commit(
            version=v, timestamp=1_700_000_000_000 + v * 1_000,
            operation="WRITE", add=add, remove=remove))
    return log


def _counting_log(root: str) -> tuple[TableLog, list]:
    log = TableLog(root)
    reads = []
    orig = TableLog.read_commit

    def counting(self, version):
        reads.append(version)
        return orig(self, version)

    log.read_commit = counting.__get__(log)
    return log, reads


@pytest.fixture(scope="module")
def deep_log_root(tmp_path_factory):
    """One shared 5k-commit log; tests that mutate it take a copy."""
    root = str(tmp_path_factory.mktemp("deep") / "t")
    _build_log(root)
    return root


def test_deep_log_snapshot_is_checkpoint_bounded(deep_log_root):
    root = deep_log_root

    # cold handle, latest snapshot: only the post-checkpoint tail
    log, reads = _counting_log(root)
    t0 = time.time()
    snap = log.snapshot()
    open_secs = time.time() - t0
    assert snap.version == DEPTH - 1
    tail = (DEPTH - 1) % TableLog.CHECKPOINT_EVERY
    assert len(reads) <= tail + 1, \
        f"cold open read {len(reads)} commits, expected <= tail {tail + 1}"
    assert open_secs < 2.0, f"cold open took {open_secs:.2f}s"

    # active state reflects the churn: 5000 adds - 100 removes
    assert len(snap.files) == DEPTH - 100 + 1

    # version time travel BELOW the newest checkpoint uses the nearest
    # older checkpoint, never a from-zero replay
    log2, reads2 = _counting_log(root)
    mid_v = DEPTH // 2 + 7
    log2.snapshot(version=mid_v)
    assert len(reads2) <= TableLog.CHECKPOINT_EVERY + 1


def test_deep_log_timestamp_lookup_is_logarithmic(deep_log_root):
    root = deep_log_root
    target_ts = 1_700_000_000_000 + (DEPTH // 3) * 1_000 + 500

    log, reads = _counting_log(root)
    snap = log.snapshot(timestamp_ms=target_ts)
    assert snap.version == DEPTH // 3
    # bisect over 5k versions: ~13 probes; replay tail: <= 100 more
    assert len(reads) <= TableLog.CHECKPOINT_EVERY + 20, \
        f"timestampAsOf read {len(reads)} commits"


def test_deep_log_checkpointless_counterfactual(deep_log_root, tmp_path):
    """Same log with checkpoints deleted: the open must replay all
    5,000 commits and still produce the identical snapshot — the
    measured counterfactual that justifies the checkpoint cadence."""
    root = str(tmp_path / "t")
    shutil.copytree(deep_log_root, root)
    log = TableLog(root)
    with_ckpt = log.snapshot()

    for f in os.listdir(log.log_path):
        if f.endswith(".checkpoint.json"):
            os.unlink(os.path.join(log.log_path, f))
    bare, reads = _counting_log(root)
    t0 = time.time()
    full = bare.snapshot()
    full_secs = time.time() - t0
    assert len(reads) == DEPTH
    assert full_secs < 5.0, f"full replay took {full_secs:.2f}s"

    assert full.version == with_ckpt.version
    assert sorted(f.path for f in full.files) == \
        sorted(f.path for f in with_ckpt.files)
    assert full.dvs == with_ckpt.dvs
