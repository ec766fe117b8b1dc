"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exactness baseline: the query matrix is
  broadcast once with ray.put; each batch computes one numpy matmul
  and emits its LOCAL top-k per query; a tiny driver-side merge
  reduces per-batch top-k lists to the global top-k. No shuffle; the
  reduction input is O(n_batches * n_queries * k), not O(rows).
* ``ivf_topk``      — the scale path: deterministic k-means (fixed
  seed, few iterations over a sample) builds centroids; rows are
  assigned to their nearest centroid in one map_batches; queries probe
  only the ``n_probe`` nearest centroid partitions.
* ``knn_classify``  — majority label of the exact top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _filter_ids(ds, id_col: str, wanted) -> "object":
    """Row filter by membership — a map_batches isin, never a
    string-interpolated filter expression (works for any id dtype and
    any candidate-set size)."""
    wanted = set(wanted)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col].isin(wanted)]
    return ds.map_batches(f, batch_format="pandas")


def brute_force_topk(ds, query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id) rows."""
    import ray

    qdf = _filter_ids(ds.select_columns([id_col, vec_col]),
                      id_col, query_ids).to_pandas()
    qdf = qdf.sort_values(id_col)
    qids = qdf[id_col].to_numpy()
    qmat = _norm_rows(np.stack(qdf[vec_col].to_numpy()))
    ref = ray.put((qids, qmat))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        bq_ids, bq = ray.get(ref)
        mat = _norm_rows(np.stack(df[vec_col].to_numpy()))
        ids = df[id_col].to_numpy()
        sims = bq @ mat.T                       # (nq, batch)
        if exclude_self:
            for i, qid in enumerate(bq_ids):
                self_pos = np.flatnonzero(ids == qid)
                sims[i, self_pos] = -np.inf
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = []
        for i, qid in enumerate(bq_ids):
            for j in top[i]:
                if np.isfinite(sims[i, j]):
                    rows.append((int(qid), float(sims[i, j]), int(ids[j])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partial = ds.map_batches(local_topk, batch_format="pandas",
                             batch_size=4096).to_pandas()
    # global merge: top-k per query, deterministic tie-break by id
    partial = partial.sort_values(["query_id", "cos", "neighbor_id"],
                                  ascending=[True, False, True])
    out = partial.groupby("query_id").head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "neighbor_id", "cos"]]


def kmeans_fit(mat: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 0) -> np.ndarray:
    """Deterministic mini k-means (cosine/normalized space)."""
    rng = np.random.default_rng(seed)
    m = _norm_rows(mat)
    idx = rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)
    cent = m[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _norm_rows(cent)
    return cent


def ivf_topk(ds, query_ids: list[int], k: int = 10, n_clusters: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pd.DataFrame:
    """Approximate top-k: centroids from a deterministic sample, rows
    filtered to the probed clusters, then exact search within them."""
    import ray

    sample = ds.limit(2000).select_columns([vec_col]).to_pandas()
    cent = kmeans_fit(np.stack(sample[vec_col].to_numpy()), n_clusters)
    cref = ray.put(cent)

    qdf = _filter_ids(ds.select_columns([id_col, vec_col]),
                      id_col, query_ids).to_pandas().sort_values(id_col)
    qmat = _norm_rows(np.stack(qdf[vec_col].to_numpy()))
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    probed_clusters = set(probe.ravel().tolist())

    def assign_and_filter(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        mat = _norm_rows(np.stack(df[vec_col].to_numpy()))
        df = df.copy()
        df["cluster"] = np.argmax(mat @ c.T, axis=1)
        return df[df["cluster"].isin(probed_clusters)]

    shard = ds.map_batches(assign_and_filter, batch_format="pandas")
    return brute_force_topk(shard, query_ids, k=k, id_col=id_col,
                            vec_col=vec_col)


def knn_classify(ds, query_ids: list[int], k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> pd.DataFrame:
    """(query_id, predicted_label) by majority vote of exact top-k."""
    top = brute_force_topk(ds, query_ids, k=k, id_col=id_col,
                           vec_col=vec_col)
    # only the neighbors' labels reach the driver (bounded: n_queries*k
    # rows), not the whole dataset's label column
    labels = _filter_ids(ds.select_columns([id_col, label_col]),
                         id_col, top["neighbor_id"].tolist()).to_pandas()
    merged = top.merge(labels, left_on="neighbor_id", right_on=id_col)
    out = (merged.groupby("query_id")[label_col]
           .agg(lambda s: s.value_counts().sort_index().idxmax())
           .reset_index().rename(columns={label_col: "predicted_label"}))
    return out.sort_values("query_id").reset_index(drop=True)
