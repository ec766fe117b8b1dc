"""Job driver CLI — the engine's compact_lang_det_test / `ray job
submit` entry point (SURVEY.md §3.2).

  # local
  python -m cld2_ray.run --input /path/pages_parquet --output /tmp/out \
      --partitions 16

  # cluster (same script; Ray connects to the cluster it runs on)
  ray job submit --working-dir . -- python -m cld2_ray.run \
      --input s3://bucket/pages --output s3://bucket/filtered

Processes the input as N resumable partitions (state/checkpoint.py):
re-running after a failure skips finished partitions. With --synthetic
N it runs on N deterministic synthetic pages instead of an input path.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="parquet directory of pages")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run on N synthetic pages instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode CPU count (omit on a cluster)")
    ap.add_argument("--min-pct1", type=int, default=50)
    ap.add_argument("--debug-html", type=int, default=0, metavar="N",
                    help="also write N per-document HTML debug pages "
                         "(the reference's stderr debug stream, S4) "
                         "under OUTPUT/debug/")
    args = ap.parse_args(argv)

    import ray
    # only tear down a session this CLI itself started — embedded
    # callers (tests, a larger driver) keep theirs (found by an
    # order-dependent test failure: main() killed the shared session
    # and the next Dataset join died mid-shuffle)
    owns_ray = not ray.is_initialized()
    if owns_ray:
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from cld2_ray.pipelines import flagship
    from cld2_ray.state import checkpoint as cp

    if args.synthetic:
        # ceil division: floor would silently drop the trailing
        # (synthetic mod partitions) documents
        per = max(-(-args.synthetic // args.partitions), 1)

        def make_part(pid):
            # regenerate exactly this partition's id range (deterministic)
            from cld2_ray.sources.pages import page_batch
            start = pid * per
            count = max(min(per, args.synthetic - start), 0)
            return rd.from_arrow(page_batch(start, count))
    else:
        import glob
        import os
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        if not files:
            print(f"no parquet files under {args.input}", file=sys.stderr)
            return 2
        shards = [files[i::args.partitions] for i in range(args.partitions)]
        shards = [s for s in shards if s]

        def make_part(pid):
            return rd.read_parquet(shards[pid])

        args.partitions = len(shards)

    summary = cp.run_resumable(make_part, args.partitions, args.output,
                               flagship.build_fused)
    if args.debug_html:
        import os

        from cld2_ray.pipelines.debughtml import write_debug_sample
        n = write_debug_sample(make_part(0),
                               os.path.join(args.output, "debug"),
                               n=args.debug_html)
        summary["debug_html_pages"] = n
    print(json.dumps({"output": args.output, **summary}))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
