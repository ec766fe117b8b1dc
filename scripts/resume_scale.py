"""Checkpoint-resume byte-identity at bench scale (north rule:
resumable output). Simulates the crash window state/checkpoint.py is
designed around — some partitions finished (manifest present), ONE
partition with data but no manifest (killed mid-write) — then resumes
and asserts the final output is byte-identical to an uninterrupted
run over the same input.

  python scripts/resume_scale.py                 # 1.28M pages, 16 parts
  GRAFT_RESUME_PAGES=128000 python scripts/...   # smaller

Prints one JSON line with walls + the identity verdict; exits 1 on
any mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    from cld2_ray.pipelines import flagship
    from cld2_ray.sources.pages import write_pages_parquet
    from cld2_ray.state import checkpoint as cp

    n_pages = int(os.environ.get("GRAFT_RESUME_PAGES", "1280000"))
    n_parts = 16
    per = n_pages // n_parts
    kill_after = 9

    # cache each partition's pages to parquet ONCE (untimed): the
    # identity check measures the pipeline + checkpoint machinery, not
    # synthetic page generation (same policy as bench.py)
    caches = []
    for pid in range(n_parts):
        c = f"/tmp/cld2_ray_bench/resume_part{pid}_{per}"
        write_pages_parquet(c, per, seed=1000 + pid)
        caches.append(c)

    def make_part(pid: int):
        return rd.read_parquet(caches[pid])

    out_a = "/tmp/cld2_ray_resume/a"
    out_b = "/tmp/cld2_ray_resume/b"
    shutil.rmtree("/tmp/cld2_ray_resume", ignore_errors=True)

    t0 = time.time()
    ra = cp.run_resumable(make_part, n_parts, out_a,
                          flagship.build_fused)
    wall_clean = time.time() - t0
    assert ra["done"] == n_parts, ra

    # interrupted run: kill_after partitions complete, then a crash
    # mid-partition leaves data with NO manifest (the at-most-one
    # dirty partition the manifest ordering guarantees)
    t0 = time.time()
    cp.run_resumable(make_part, kill_after, out_b,
                     flagship.build_fused)
    dirty = os.path.join(cp.partition_dir(out_b, kill_after), "data")
    flagship.build_fused(
        make_part(kill_after).limit(per // 3)).write_parquet(dirty)
    wall_before_kill = time.time() - t0

    t0 = time.time()
    rb = cp.run_resumable(make_part, n_parts, out_b,
                          flagship.build_fused)
    wall_resume = time.time() - t0
    assert rb["skipped"] == kill_after, rb
    assert rb["done"] == n_parts - kill_after, rb

    def load(root: str) -> pd.DataFrame:
        parts = sorted(
            d for d in os.listdir(root) if d.startswith("part="))
        frames = [pads.dataset(os.path.join(root, d, "data"))
                  .to_table().to_pandas() for d in parts]
        df = pd.concat(frames, ignore_index=True)
        # urls repeat ACROSS partitions (each partition indexes its
        # own page space), so sort by every column — ties are then
        # fully identical rows and the order is canonical
        return df.sort_values(list(df.columns)) \
            .reset_index(drop=True)

    a = load(out_a)
    b = load(out_b)
    identical = a.equals(b)
    if not identical:
        for col in a.columns:
            if not a[col].equals(b[col]):
                print(f"column {col} differs", file=sys.stderr)
    print(json.dumps({
        "metric": "resume_byte_identical",
        "value": bool(identical),
        "n_pages": n_pages,
        "n_parts": n_parts,
        "kill_after_partition": kill_after,
        "rows": int(len(a)),
        "wall_clean_sec": round(wall_clean, 1),
        "wall_before_kill_sec": round(wall_before_kill, 1),
        "wall_resume_sec": round(wall_resume, 1),
    }))
    shutil.rmtree("/tmp/cld2_ray_resume", ignore_errors=True)
    ray.shutdown()
    sys.exit(0 if identical else 1)


if __name__ == "__main__":
    main()
