"""The flagship quality-filter pipeline (north rule end-to-end).

read/generate pages -> extract (tasks) -> langid (actor pool) ->
quality+scrub (actor pool) -> [write kept docs + metrics groupby].

Sizing notes for the 100 TB case (see also state/checkpoint.py):
- extraction is stateless tasks so it elastically fills whatever CPUs
  the actor pools leave free;
- the two actor pools use ``concurrency=(min, max)`` autoscaling with
  1 CPU each; model load is once per actor;
- giant pages are bounded by the extractor itself (the 160KB letter
  scan cap) so per-row cost is capped — no special skew handling needed
  beyond Ray's dynamic block splitting;
- metrics pre-aggregate per batch (partial_metrics) before the tiny
  keyed shuffle.
"""

from __future__ import annotations

from cld2_ray.stages.core import (
    FusedPipelineStage, LangidStage, QualityScrubStage, combine_metrics,
    extract_batch, fused_batch, partial_metrics)

OUT_COLUMNS = [
    "url", "warc_ts", "lang", "extracted_text", "utf8_valid",
    "lang_summary", "lang1", "lang2", "lang3", "pct1", "pct2", "pct3",
    "nscore1", "lang_reliable", "text_bytes", "n_words", "n_chars",
    "aux_lang", "aux_conf", "ppl", "scrubbed_text", "n_pii",
    "has_toxicity", "keep", "drop_reason",
]


def build(pages_ds, langid_concurrency=(1, 8), quality_concurrency=(1, 8),
          batch_size: int = 256, with_chunks: bool = False):
    """pages Dataset -> fully annotated Dataset (lazy).

    ``with_chunks=True`` (opt-in: computes a second ranged detection
    pass per page) adds a ``chunks`` list<struct{offset,bytes,lang}>
    column — per-page language ranges in RAW page byte offsets, the
    ResultChunkVector analogue (reference public/compact_lang_det.h:
    146-153 via ExtDetectLanguageSummary's vector output)."""
    ds = pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                              batch_size=batch_size)
    ds = ds.map_batches(LangidStage, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=langid_concurrency, num_cpus=1,
                        fn_constructor_kwargs={"with_chunks": with_chunks})
    ds = ds.map_batches(QualityScrubStage, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=quality_concurrency, num_cpus=1)
    cols = OUT_COLUMNS + (["chunks"] if with_chunks else [])
    return ds.select_columns(cols)


def build_fused(pages_ds, concurrency: int | None = None,
                batch_size: int = 256, with_chunks: bool = False):
    """Single-stage fused pipeline (see FusedPipelineStage): best
    utilization / scaling; same row-level semantics as build().

    ``concurrency=None`` (default) runs the fused kernel as plain Ray
    TASKS with a lazy per-worker model cache (stages/core.fused_batch):
    worker processes are reused across executions, so model setup is
    paid once per worker per session and the stage elastically fills
    every free CPU — no pool sizing.  Pass an int to pin a fixed actor
    pool instead (needed when the stage must reserve >1 CPU or GPUs)."""
    if concurrency is None:
        ds = pages_ds.map_batches(fused_batch, batch_format="pyarrow",
                                  batch_size=batch_size,
                                  fn_kwargs={"with_chunks": with_chunks})
    else:
        ds = pages_ds.map_batches(
            FusedPipelineStage, batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency, num_cpus=1,
            fn_constructor_kwargs={"with_chunks": with_chunks})
    cols = OUT_COLUMNS + (["chunks"] if with_chunks else [])
    return ds.select_columns(cols)


def metrics(annotated_ds):
    """Per-language / per-outcome metrics -> pandas DataFrame.

    Shape: per-batch partial aggregation (partial_metrics, FUSED by Ray
    Data into the main map op — its input never leaves the worker),
    then a streaming driver-side fold of the tiny pre-aggregated
    blocks.  The group-key cardinality is small (languages x outcomes,
    ~100 rows), so any distributed combine is pure overhead here:
    - a sort-based ``groupby().aggregate()`` shuffle costs ~65 s of
      CPU for 8,794 partial rows and its all-to-all reservation
      starves the expensive map op (26.3 s vs 16.5 s measured span);
    - even a fusion-separated bundling ``map_batches`` combine level
      adds an operator reservation worth ~3.5 s on a 14 s run;
    - and a NON-separated combine level is a trap: Ray fuses the whole
      task chain into one op, so its large ``batch_size`` becomes the
      fused op's min-rows-per-bundle and collapses parallelism to
      n_rows/batch_size tasks (measured 70 s vs 14 s).
    The driver fold processes each ~45-row partial block as it
    streams in and compacts whenever the buffer tops 64k rows, so
    driver memory is bounded by groups + 64k rows regardless of
    corpus size (at 100 TB / ~1M blocks: ~45M tiny rows trickle to
    the driver over the life of the job — a few KB/s)."""
    import pandas as pd

    slim = annotated_ds.select_columns(
        ["url", "lang_summary", "keep", "drop_reason", "text_bytes",
         "n_pii"])
    partial = slim.map_batches(partial_metrics, batch_format="pandas")
    buf: list[pd.DataFrame] = []
    buffered = 0
    for b in partial.iter_batches(batch_format="pandas", batch_size=None):
        buf.append(b)
        buffered += len(b)
        if buffered >= 65536:
            buf = [combine_metrics(pd.concat(buf, ignore_index=True))]
            buffered = len(buf[0])
    if not buf:
        return partial_metrics(slim.limit(0).to_pandas())
    return combine_metrics(pd.concat(buf, ignore_index=True))


def run(pages_ds, out_dir: str | None = None, **kw):
    """Execute: returns (annotated_ds, metrics pandas DataFrame) on
    BOTH paths. If out_dir is given, kept docs are additionally
    written as partitioned parquet and the returned Dataset is the
    written copy (so downstream consumers read the sink, not a
    recompute); metrics fold over the annotated stream either way."""
    ds = build(pages_ds, **kw)
    if out_dir is not None:
        kept = ds.filter(expr="keep == True")
        kept.write_parquet(out_dir)
        import ray
        m = metrics(ds)
        return ray.data.read_parquet(out_dir), m
    m = metrics(ds)
    return ds, m
