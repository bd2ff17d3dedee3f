#!/usr/bin/env python
"""Resume-after-kill evidence (north rule: resumable per-partition
checkpoints).

Protocol (three real OS processes, hard SIGKILL — no cooperative
shutdown):

1. baseline: run the flagship pipeline one-shot into <out>/oneshot.
2. killed run: start the same pipeline into <out>/resumed with
   --batch-partitions N in a subprocess; poll the checkpoint manifest
   (DuckDB reads the parquet while the child is alive) and SIGKILL the
   child as soon as >= 1 batch has committed.
3. resume: re-run the same command; it must report skipped > 0 (only
   missing partitions re-executed) and finish.
4. verify: the per-partition (part_key, rows_out, checksum) manifest
   sets and the physical parquet row counts of oneshot vs
   killed+resumed are IDENTICAL.

Writes the machine-readable record to BENCH/resume_kill_r05.json.

Usage: python scripts/resume_kill_test.py [--pages 200000] [--grid 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pipeline_cmd(out: str, pages: int, grid: int, batch: int | None) -> list[str]:
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--pages", str(pages),
        "--grid", str(grid),
        "--output", out,
    ]
    if batch is not None:
        cmd += ["--batch-partitions", str(batch)]
    return cmd


def _manifest_rows(base: str) -> int:
    import duckdb

    glob = os.path.join(base, "_manifest", "*.parquet")
    try:
        return duckdb.sql(f"SELECT count(*) FROM read_parquet('{glob}')").fetchone()[0]
    except Exception:  # noqa: BLE001 — manifest not created yet
        return 0


def _manifest_set(base: str):
    import duckdb

    glob = os.path.join(base, "_manifest", "*.parquet")
    return set(
        map(
            tuple,
            duckdb.sql(
                f"SELECT part_key, rows_out, checksum FROM read_parquet('{glob}')"
            ).fetchall(),
        )
    )


def _data_rows(base: str) -> int:
    import duckdb

    glob = os.path.join(base, "data", "*", "*.parquet")
    return duckdb.sql(f"SELECT count(*) FROM read_parquet('{glob}')").fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--grid", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="resume_kill_")
    oneshot = os.path.join(work, "oneshot")
    resumed = os.path.join(work, "resumed")
    record: dict = {"pages": args.pages, "grid": args.grid, "batch": args.batch}

    # 1. baseline one-shot
    t0 = time.time()
    r = subprocess.run(
        _pipeline_cmd(oneshot, args.pages, args.grid, None),
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    record["oneshot"] = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    record["oneshot_wall_sec"] = round(time.time() - t0, 1)

    # 2. killed run: SIGKILL as soon as the first batch has committed
    child = subprocess.Popen(
        _pipeline_cmd(resumed, args.pages, args.grid, args.batch),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    committed_at_kill = 0
    deadline = time.time() + 600
    while time.time() < deadline:
        committed_at_kill = _manifest_rows(resumed)
        if committed_at_kill >= 1:
            break
        if child.poll() is not None:
            break
        time.sleep(0.2)
    if child.poll() is None:
        os.kill(child.pid, signal.SIGKILL)
        child.wait()
        record["killed"] = True
    else:
        # pipeline finished before we could kill it — rerun with a
        # bigger workload to make the window real
        record["killed"] = False
    record["partitions_committed_at_kill"] = int(committed_at_kill)
    total_parts = record["oneshot"]["partitions_total"]
    assert record["killed"], "pipeline finished before the kill window; raise --pages"
    assert 0 < committed_at_kill < total_parts, (
        f"kill landed outside the partial window: {committed_at_kill}/{total_parts}"
    )

    # 3. resume
    t0 = time.time()
    r = subprocess.run(
        _pipeline_cmd(resumed, args.pages, args.grid, args.batch),
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    record["resume"] = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    record["resume_wall_sec"] = round(time.time() - t0, 1)
    assert record["resume"]["skipped"] >= committed_at_kill, record["resume"]
    assert record["resume"]["skipped"] < total_parts, (
        "resume skipped everything — kill was not partial"
    )

    # 4. verify equality: manifests (per-partition rows+checksum) and
    # physical parquet row counts
    m_one, m_res = _manifest_set(oneshot), _manifest_set(resumed)
    record["manifest_partitions"] = len(m_one)
    record["manifests_equal"] = m_one == m_res
    record["rows_oneshot"] = _data_rows(oneshot)
    record["rows_resumed"] = _data_rows(resumed)
    record["rows_equal"] = record["rows_oneshot"] == record["rows_resumed"]
    assert record["manifests_equal"], "per-partition checksums diverge after resume"
    assert record["rows_equal"], "row counts diverge after resume"

    out_path = os.path.join(REPO, "BENCH", "resume_kill_r05.json")
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    print(f"OK — artifact written to {out_path}", file=sys.stderr)
    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
