"""Scale stress harness: deterministic 10-100x-gate-scale tables +
timed runs of every heavy pipeline over them.

  python scripts/stress.py gen            # build /tmp/stress (~1 GB)
  python scripts/stress.py run            # time the heavy queries
  python scripts/stress.py run --only exact_dedup,minhash_dedup
  python scripts/stress.py dupstress      # ~50%-dup corpus through
                                          # mode='join' pass 2, asserts
                                          # bounded driver RSS

The corpus is deliberately adversarial for dedup: a tiny Zipf
vocabulary (boilerplate-heavy web text) makes LSH band buckets LARGE
and exact-dup clusters long — the regime that exposed the round-2
scale bugs recorded in BASELINE.md. Known output-bound queries
(jaccard_pairs, simhash_pairs, the SQL-mirrored minhash variant) are
excluded from `run` by default: their OUTPUT is Theta(pairs) on this
corpus by contract.
"""

import argparse
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/tmp/stress"
QUERIES = [
    "lang_counts", "exact_dedup", "token_freq_top50", "epoch_shuffle",
    "length_cdf", "stratified_sample", "incremental_dedup",
    "decontaminate", "inverted_index", "tfidf_top5", "segment_dedup",
    "substring_dedup", "kmv_distinct",
    "source_vocab", "bigram_top50", "quality_rules", "pii_scrub",
    "stopword_counts", "token_stats", "langid_documents",
    "lang_quantiles", "source_quota", "lang_source_rollup",
    "events_hourly", "click_buyers", "event_sessions", "events_window",
    "asof_join", "range_join", "tpch_q1", "tpch_q3",
    "orders_by_segment", "customers_without_orders",
    "orders_per_customer", "part_brand_stats", "ann_top1", "ivf_topk",
    "knn_classify", "embedding_label_stats",
    "url_canonical_dedup", "domain_stats", "minhash_fast",
    "gopher_repetition", "gopher_full", "c4_line_filter",
    "blocklist_filter", "webtext_clean", "line_dedup",
    "url_blocklist", "pack_sequences", "incremental_dedup_bloom",
]


def gen_documents(rng, n=200_000):
    vocab = np.array(["w%04d" % i for i in range(5000)], dtype=object)
    langs = np.array(["en", "fr", "de", "es", "it"], dtype=object)
    writer = None
    for start in range(0, n, 20_000):
        m = 20_000
        lens = rng.integers(40, 240, m)
        ranks = (rng.pareto(1.1, lens.sum()).astype(np.int64)) % 5000
        toks = vocab[ranks]
        bounds = np.cumsum(lens)
        texts = [" ".join(toks[a:b]) for a, b in
                 zip(np.concatenate([[0], bounds[:-1]]), bounds)]
        ids = np.arange(start, start + m, dtype=np.int64)
        dup = rng.random(m) < 0.05          # 5% exact dupes
        for i in np.nonzero(dup)[0]:
            if i >= 1:
                texts[i] = texts[i - 1]
        t = pa.table({
            "doc_id": ids,
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[ids % 5]),
            "source": pa.array([f"src{i % 20}" for i in ids], pa.string()),
            "n_chars": pa.array(
                np.array([len(x) for x in texts], np.int64))})
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/documents.parquet", t.schema)
        writer.write_table(t)
    writer.close()


def gen_embeddings(rng, n=200_000, d=64, k=40):
    cent = rng.standard_normal((k, d)).astype(np.float32)
    writer = None
    for start in range(0, n, 50_000):
        m = 50_000
        lab = rng.integers(0, k, m).astype(np.int32)
        v = cent[lab] + 0.15 * rng.standard_normal((m, d)).astype(np.float32)
        dup = rng.random(m) < 0.02          # 2% near-dups
        idx = np.nonzero(dup)[0]
        idx = idx[idx >= 1]
        v[idx] = v[idx - 1] \
            + 0.001 * rng.standard_normal((len(idx), d)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(start, start + m, dtype=np.int64)),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "label": pa.array(lab)})
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/embeddings.parquet", t.schema)
        writer.write_table(t)
    writer.close()


def gen_events(rng, n=2_000_000):
    types = np.array(["signup", "click", "error", "view", "purchase"],
                     dtype=object)
    base = np.datetime64("2025-01-01T00:00:00", "us")
    writer = None
    for start in range(0, n, 500_000):
        m = 500_000
        ts = base + (rng.integers(0, 90 * 24 * 3600, m)
                     * 1_000_000).astype("timedelta64[us]")
        t = pa.table({
            "event_id": pa.array(np.arange(start, start + m,
                                           dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 50_000, m)
                                .astype(np.int64)),
            "event_type": pa.array(types[rng.integers(0, 5, m)]),
            "value": pa.array(np.round(rng.random(m) * 100, 2)),
            "props": pa.array(["{}"] * m, pa.string())})
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/events.parquet", t.schema)
        writer.write_table(t)
    writer.close()


def gen_tpch(rng, nc=150_000, no=1_500_000, nl=6_000_000, npart=200_000):
    base = np.datetime64("1995-01-01", "us")
    seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                    "MACHINERY"], dtype=object)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": pa.array([f"Customer{i}" for i in range(nc)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.random(nc) * 10000 - 1000, 2)),
        "c_mktsegment": pa.array(seg[rng.integers(0, 5, nc)])}),
        f"{OUT}/customer.parquet")

    pri = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                    "5-LOW"], dtype=object)
    st = np.array(["O", "F", "P"], dtype=object)
    od = base + (rng.integers(0, 2400, no)
                 * 86_400_000_000).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, nc, no).astype(np.int64)),
        "o_orderstatus": pa.array(st[rng.integers(0, 3, no)]),
        "o_totalprice": pa.array(np.round(rng.random(no) * 200000, 2)),
        "o_orderdate": pa.array(od),
        "o_orderpriority": pa.array(pri[rng.integers(0, 5, no)])}),
        f"{OUT}/orders.parquet")

    rf = np.array(["A", "N", "R"], dtype=object)
    ls = np.array(["O", "F"], dtype=object)
    sd = base + (rng.integers(0, 2500, nl)
                 * 86_400_000_000).astype("timedelta64[us]")
    writer = None
    for s0 in range(0, nl, 1_500_000):
        m = 1_500_000
        t = pa.table({
            "l_orderkey": pa.array(rng.integers(0, no, m)
                                   .astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, npart, m)
                                  .astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, 10_000, m)
                                  .astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, m)
                                     .astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, m)
                                   .astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.random(m) * 100000,
                                                 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, m) * 0.01,
                                            2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, m) * 0.01, 2)),
            "l_returnflag": pa.array(rf[rng.integers(0, 3, m)]),
            "l_linestatus": pa.array(ls[rng.integers(0, 2, m)]),
            "l_shipdate": pa.array(sd[s0:s0 + m])})
        if writer is None:
            writer = pq.ParquetWriter(f"{OUT}/lineitem.parquet", t.schema)
        writer.write_table(t)
    writer.close()

    br = np.array([f"Brand#{i}{j}" for i in range(1, 6)
                   for j in range(1, 6)], dtype=object)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(npart, dtype=np.int64)),
        "p_name": pa.array([f"part {i}" for i in range(npart)],
                           pa.string()),
        "p_brand": pa.array(br[rng.integers(0, 25, npart)]),
        "p_type": pa.array([f"TYPE {i % 30}" for i in range(npart)],
                           pa.string()),
        "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900 + rng.random(npart) * 1100,
                                           2))}),
        f"{OUT}/part.parquet")
    # small dims so every registry query can run
    for t_name in ("nation", "region", "supplier"):
        shutil.copy(f"/root/testdata/sf0.01/{t_name}.parquet",
                    f"{OUT}/{t_name}.parquet")


def cmd_gen():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    t0 = time.time()
    gen_documents(np.random.default_rng(7))
    gen_embeddings(np.random.default_rng(11))
    gen_events(np.random.default_rng(13))
    gen_tpch(np.random.default_rng(17))
    total = sum(os.path.getsize(os.path.join(OUT, f))
                for f in os.listdir(OUT))
    print(f"generated {OUT}: {total / 1e6:.0f} MB in "
          f"{time.time() - t0:.0f}s")


DUP_OUT = "/tmp/stress_dup"


def cmd_dupstress():
    """Forced ~50%-duplicated corpus through substring/segment dedup's
    mode='join' pass 2, asserting the driver's peak-RSS growth stays
    bounded. This is the regime where the old broadcast pass 2 dies:
    every doc's second half is a passage shared with exactly one other
    doc, so the duplicated-window set scales with duplicated-TOKEN
    volume (~4.4M DISTINCT window keys here; ~530 MB as a driver md5
    set, 1e10-1e11 keys at the 100-TB target) — not a heavy-hitter
    tail. The join path never materializes it anywhere.
    """
    import resource

    import ray

    n, own, shared = 120_000, 40, 80
    shutil.rmtree(DUP_OUT, ignore_errors=True)
    os.makedirs(DUP_OUT)
    writer = None
    for start in range(0, n, 20_000):
        texts = []
        for i in range(start, start + 20_000):
            pid = i // 2                       # each passage in 2 docs
            texts.append(
                " ".join(f"d{i}_{j}" for j in range(own)) + " "
                + " ".join(f"p{pid}_{j}" for j in range(shared)))
        t = pa.table({
            "doc_id": pa.array(np.arange(start, start + 20_000,
                                         dtype=np.int64)),
            "text": pa.array(texts, pa.string())})
        if writer is None:
            writer = pq.ParquetWriter(f"{DUP_OUT}/documents.parquet",
                                      t.schema)
        writer.write_table(t)
    writer.close()

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    from ray.data.aggregate import Count, Sum
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from cld2_ray.pipelines.dedup import segment_dedup, substring_dedup

    def read():
        import ray.data as rd
        return rd.read_parquet(f"{DUP_OUT}/documents.parquet",
                               columns=["doc_id", "text"])

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    failures = 0
    for name, fn in [
        ("substring_dedup[join,fast]",
         lambda: substring_dedup(read(), hash_fn="fast", mode="join")),
        ("segment_dedup[join]",
         lambda: segment_dedup(read(), mode="join")),
    ]:
        t0 = time.time()
        out = fn()
        agg_col = "dup_tokens" if "substring" in name else "n_dropped"
        stats = out.aggregate(Count(), Sum(agg_col))
        dt = time.time() - t0
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        grew = (rss1 - rss0) / 1024  # MiB
        ok = stats["count()"] == n and stats[f"sum({agg_col})"] > 0 \
            and grew < 300
        # the duplicated half must actually be detected: every doc
        # shares its `shared`-token tail with exactly one other doc
        if "substring" in name and stats[f"sum({agg_col})"] != n * shared:
            ok = False
        failures += 0 if ok else 1
        print(f"[{'RSS-OK' if ok else ' FAIL '}] {name}: "
              f"rows={stats['count()']} sum_{agg_col}="
              f"{stats[f'sum({agg_col})']} driver_rss_growth="
              f"{grew:.0f}MiB (bound 300) in {dt:.1f}s", flush=True)
    ray.shutdown()
    sys.exit(1 if failures else 0)


def cmd_run(only=None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry
    qs = entry.queries()

    def _minhash_fast(sf_dir):
        # the PRODUCTION minhash path (blake2b, clique_cutoff=64) with
        # a driver-heap bound: the bands exchange carries shingle sets
        # 16x, the regime where un-coalesced sort pieces fell under
        # Ray's owner-inline threshold and put 1.58 GiB on the driver
        # (BASELINE.md owner-inline sweep #2)
        import ray.data as rd
        from cld2_ray.pipelines.dedup import minhash_dedup

        def anon():
            for line in open("/proc/self/smaps_rollup"):
                if line.startswith("Anonymous:"):
                    return int(line.split()[1]) // 1024
        a0 = anon()
        out = minhash_dedup(rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))
        grew = anon() - a0
        assert grew < 300, \
            f"minhash_fast driver anon growth {grew}MiB (bound 300)"
        return out
    qs = dict(qs, minhash_fast=_minhash_fast)

    names = only or QUERIES
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            r = qs[name](OUT)
            if hasattr(r, "to_pandas"):
                r = r.to_pandas()
            print(f"[ OK ] {name}: {len(r)} rows in "
                  f"{time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"[FAIL] {name}: {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "run", "dupstress"])
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset")
    args = ap.parse_args()
    if args.cmd == "gen":
        cmd_gen()
    elif args.cmd == "dupstress":
        cmd_dupstress()
    else:
        cmd_run(args.only.split(",") if args.only else None)
