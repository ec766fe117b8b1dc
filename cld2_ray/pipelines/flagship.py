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
    FusedPipelineStage, LangidStage, QualityScrubStage, extract_batch,
    partial_metrics)

OUT_COLUMNS = [
    "url", "warc_ts", "lang", "extracted_text", "utf8_valid",
    "lang_summary", "lang1", "lang2", "lang3", "pct1", "pct2", "pct3",
    "nscore1", "lang_reliable", "text_bytes", "n_words", "n_chars",
    "aux_lang", "aux_conf", "ppl", "scrubbed_text", "n_pii",
    "has_toxicity", "keep", "drop_reason",
]


def build(pages_ds, langid_concurrency=(1, 8), quality_concurrency=(1, 8),
          batch_size: int = 256):
    """pages Dataset -> fully annotated Dataset (lazy)."""
    ds = pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                              batch_size=batch_size)
    ds = ds.map_batches(LangidStage, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=langid_concurrency, num_cpus=1)
    ds = ds.map_batches(QualityScrubStage, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=quality_concurrency, num_cpus=1)
    return ds.select_columns(OUT_COLUMNS)


def build_fused(pages_ds, concurrency: int = 8, batch_size: int = 256):
    """Single-pool fused pipeline (see FusedPipelineStage): best
    utilization / scaling; same row-level semantics as build()."""
    ds = pages_ds.map_batches(FusedPipelineStage, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)
    return ds.select_columns(OUT_COLUMNS)


def metrics(annotated_ds):
    """Per-language / per-outcome metrics: partial per-batch combine,
    then a small keyed groupby (the only shuffle in the pipeline).
    Columns are projected BEFORE the pandas conversion so the partial
    tasks never deserialize the text payloads."""
    from ray.data.aggregate import Sum

    slim = annotated_ds.select_columns(
        ["url", "lang_summary", "keep", "drop_reason", "text_bytes",
         "n_pii"])
    partial = slim.map_batches(partial_metrics, batch_format="pandas")
    return partial.groupby(["lang_summary", "keep", "drop_reason"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("bytes", alias_name="bytes"),
        Sum("pii", alias_name="n_pii"),
    )


def run(pages_ds, out_dir: str | None = None, **kw):
    """Execute: returns (annotated_ds, metrics pandas DataFrame).
    If out_dir is given, kept docs are written as partitioned parquet."""
    ds = build(pages_ds, **kw)
    if out_dir is not None:
        kept = ds.filter(expr="keep == True")
        kept.write_parquet(out_dir)
        import ray
        ds = ray.data.read_parquet(out_dir)
        return ds, None
    m = metrics(ds).to_pandas()
    return ds, m
