"""Checkpoint/resume manifest with per-partition lineage + metrics.

The reference restarts whole runs and destroys output dirs
(covsar/closure_inten.py:620-625, covsar/evd.py:36-41 — clear-and-recreate,
non-resumable). The engine instead records a manifest row per work partition
(source-group x span-range) with status + metrics; re-runs skip completed
partitions and idempotently overwrite only pending ones (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Local layout (stands in for an Iceberg metadata table at cluster scale):

    <root>/manifest.jsonl     one JSON line per completed partition
    <root>/data/<part>/       parquet output per partition (atomic: written
                              to data/.tmp-<part> then renamed)
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class CheckpointManifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "manifest.jsonl")
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    def done(self) -> dict[str, dict]:
        """Completed partitions. A TORN trailing line (crash mid-append)
        must not poison resume: an unparsable line is treated as
        not-recorded — its partition simply re-runs, which is the
        idempotent-recompute contract anyway (round-4 review: a bare
        json.loads here permanently broke resume after the exact crash the
        manifest exists to recover from)."""
        out: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn partial line from a crashed append
                    out[rec["partition"]] = rec
        return out

    def record(self, partition: str, metrics: dict) -> None:
        rec = {"partition": partition, "status": "done", "ts": time.time(), **metrics}
        # heal a newline-less tail left by a crashed append, so this record
        # never concatenates onto a torn line
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                f.seek(0, os.SEEK_END)
                if f.tell() > 0:
                    f.seek(-1, os.SEEK_END)
                    torn = f.read(1) != b"\n"
                else:
                    torn = False
        else:
            torn = False
        with open(self.path, "a") as f:
            # single write incl. the newline: an interrupted append can tear
            # THIS record (tolerated by done()) but never a prior one
            f.write(("\n" if torn else "") + json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.root, "data", partition)


def run_resumable(
    manifest: CheckpointManifest,
    partitions: Iterable[str],
    build: Callable[[str], DataFrame],
) -> dict[str, dict]:
    """Run `build(partition)` for every partition not yet in the manifest.

    Each partition's output is written to a temp dir and atomically renamed,
    then the manifest line is appended — a crash between the two leaves a
    completed dir without a manifest line, and the rerun simply overwrites it
    (idempotent window recompute, SURVEY.md §2.9). Returns per-partition
    metrics for the lineage/metrics table.
    """
    done = manifest.done()
    results: dict[str, dict] = {}
    for part in partitions:
        if part in done:
            results[part] = {**done[part], "skipped": True}
            continue
        t0 = time.time()
        df = build(part)
        final = manifest.partition_dir(part)
        tmp = os.path.join(self_dir := os.path.dirname(final), f".tmp-{os.path.basename(final)}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        # observe() counts during the write itself — one pass, not a
        # write-then-re-read (which doubled I/O on the resume path)
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n_rows")).write.mode("overwrite").parquet(tmp)
        n_rows = int(obs.get["n_rows"])
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        metrics = {"n_rows": n_rows, "wall_s": round(time.time() - t0, 3), "skipped": False}
        manifest.record(part, {k: v for k, v in metrics.items() if k != "skipped"})
        results[part] = metrics
    return results
