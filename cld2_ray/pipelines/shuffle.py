"""Shared shuffle-shaping helpers for the query pipelines."""

from __future__ import annotations


def exchange_blocks(vol_bytes: float) -> int:
    """Map-side block count for a bucket/keyed exchange of
    ``vol_bytes`` so every sort piece (map block x reduce partition)
    stays well above Ray's ~100 KB owner-inline threshold. Ray stores
    sub-100KB task returns INLINE in the owner (the driver), so a
    shuffle fragmented into tiny pieces quietly re-centralizes its
    whole volume onto the driver heap — measured 2.6 GiB of driver
    growth for the dup-stress dedup exchanges and 0.3-1.0 GiB for the
    token-explode groupbys at stress scale before coalescing, single-
    to double-digit MiB after. Fewer-but-bigger map blocks only cost
    exchange-map parallelism, never correctness.

    Ray's sort shuffle cuts B map blocks x B reduce partitions = B^2
    pieces, so the piece size is vol/B^2: B grows as BOTH vol/32MB
    (bounding map-block size) AND sqrt(vol/500KB) (bounding piece
    size) — take the min so pieces never fall under the inline
    threshold in the mid-size regime (a pure vol/32MB policy gives
    sub-100KB pieces for 10-26 GB exchanges). The 512 cap is sized
    for a single node; on a large cluster raise it with node count
    (map blocks past the cap grow linearly but pieces only get
    bigger, so the driver hazard never returns).

    Call on a MATERIALIZED upstream (``ds.size_bytes()`` is known) and
    feed ``ds.repartition(exchange_blocks(ds.size_bytes() or 1))``
    into the groupby."""
    return int(min(512, max(8, min(vol_bytes / (32 << 20),
                                   (vol_bytes / (500 << 10)) ** 0.5))))


def coalesced(materialized_ds):
    """``materialized_ds`` repartitioned for a safe keyed exchange
    (see exchange_blocks)."""
    return materialized_ds.repartition(
        exchange_blocks(materialized_ds.size_bytes() or 1))
