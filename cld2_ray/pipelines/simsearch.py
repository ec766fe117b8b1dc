"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exactness baseline: the query matrix is
  broadcast once with ray.put; each batch computes one numpy matmul
  and emits its LOCAL top-k per query; a tiny driver-side merge
  reduces per-batch top-k lists to the global top-k. No shuffle; the
  reduction input is O(n_batches * n_queries * k), not O(rows).
* ``ivf_topk``      — the scale path, EXACT: deterministic k-means
  (fixed seed, few iterations over a sample) builds centroids; one
  map_batches pass searches the ``n_probe`` nearest cells per query
  and simultaneously folds each cell's angular radius; cells whose
  best-possible cosine (spherical triangle inequality:
  cos(max(0, angle(q, centroid) - radius))) cannot beat the
  provisional kth-best are pruned, the rare rest get a second
  filtered scan. Result is identical to ``brute_force_topk``.
* ``knn_classify``  — majority label of the exact top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_with_ties(s: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k values of ``s`` INCLUDING every index tied
    with the kth value (argpartition alone truncates ties arbitrarily,
    which would let a per-batch cut drop the tied neighbor the global
    (cos desc, id asc) merge should have kept). -inf entries excluded."""
    kk = min(k, len(s))
    if kk == 0:
        return np.empty(0, np.int64)
    kth = np.partition(s, len(s) - kk)[len(s) - kk]
    idx = np.flatnonzero((s >= kth) & np.isfinite(s))
    return idx


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
        rows = []
        for i, qid in enumerate(bq_ids):
            for j in _topk_with_ties(sims[i], k):
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
    """EXACT top-k with IVF pruning.

    Pass 1 (one full scan): each batch assigns rows to their nearest
    centroid and emits (a) local top-k over rows in the per-query
    probed cells and (b) a per-cell running min of member-centroid
    cosine — both tiny. Pass 2 runs only for (query, cell) pairs whose
    geometric upper bound cos(max(0, theta_qc - radius_c)) could still
    beat that query's provisional kth-best; at realistic n_probe the
    expansion set is empty or a few cells, so the common cost equals
    classic approximate IVF while the result is guaranteed equal to
    ``brute_force_topk``."""
    import ray

    sample = ds.limit(2000).select_columns([vec_col]).to_pandas()
    cent = kmeans_fit(np.stack(sample[vec_col].to_numpy()), n_clusters)

    qdf = _filter_ids(ds.select_columns([id_col, vec_col]),
                      id_col, query_ids).to_pandas().sort_values(id_col)
    qids_arr = qdf[id_col].to_numpy()
    qmat = _norm_rows(np.stack(qdf[vec_col].to_numpy()))
    q_cell_cos = qmat @ cent.T                   # (nq, n_cells)
    probe = np.argsort(-q_cell_cos, axis=1)[:, :n_probe]
    probed_clusters = set(probe.ravel().tolist())
    ref = ray.put((qids_arr, qmat, cent, probed_clusters))

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        bq_ids, bq, c, probed = ray.get(ref)
        mat = _norm_rows(np.stack(df[vec_col].to_numpy()))
        ids = df[id_col].to_numpy()
        cell_cos = mat @ c.T
        assign = np.argmax(cell_cos, axis=1)
        member_cos = cell_cos[np.arange(len(mat)), assign]
        rows = []
        # (b) per-cell radius partial: one row per cell in this batch
        for cell in np.unique(assign):
            rows.append((1, -1.0, int(cell),
                         float(member_cos[assign == cell].min())))
        # (a) local top-k within probed cells
        keep = np.isin(assign, list(probed))
        if keep.any():
            sims = bq @ mat[keep].T
            kids = ids[keep]
            for i, qid in enumerate(bq_ids):
                s = sims[i].copy()
                s[kids == qid] = -np.inf
                for j in _topk_with_ties(s, k):
                    rows.append((0, float(s[j]), int(qid),
                                 int(kids[j])))
        return pd.DataFrame(rows, columns=["kind", "cos", "a", "b"])

    part = ds.map_batches(pass1, batch_format="pandas",
                          batch_size=4096).to_pandas()
    radii = part[part["kind"] == 1].groupby("a")["b"].min()
    cand = part[part["kind"] == 0].rename(
        columns={"a": "query_id", "b": "neighbor_id"})

    # provisional kth-best per query (driver-side, nq*k rows)
    cand = cand.sort_values(["query_id", "cos", "neighbor_id"],
                            ascending=[True, False, True])
    topk = cand.groupby("query_id").head(k)
    kth = topk.groupby("query_id").agg(
        n=("cos", "size"), kth=("cos", "min"))

    # expansion: cells where the bound can still beat the kth-best
    cell_r = np.zeros(len(cent))
    cell_r[radii.index.astype(int)] = np.arccos(
        np.clip(radii.to_numpy(), -1.0, 1.0))
    theta = np.arccos(np.clip(q_cell_cos, -1.0, 1.0))
    bound = np.cos(np.maximum(0.0, theta - cell_r[None, :]))
    expand: set[int] = set()
    for i, qid in enumerate(qids_arr):
        if qid in kth.index and kth.loc[qid, "n"] >= k:
            thresh = kth.loc[qid, "kth"] - 1e-9
        else:
            thresh = -np.inf                     # not enough candidates
        for cell in np.flatnonzero(bound[i] >= thresh):
            if int(cell) not in probed_clusters:
                expand.add(int(cell))

    if expand:
        def pass2(df: pd.DataFrame) -> pd.DataFrame:
            bq_ids, bq, c, _ = ray.get(ref)
            mat = _norm_rows(np.stack(df[vec_col].to_numpy()))
            assign = np.argmax(mat @ c.T, axis=1)
            sel = np.isin(assign, list(expand))
            if not sel.any():
                return pd.DataFrame(
                    columns=["cos", "query_id", "neighbor_id"])
            mat = mat[sel]
            ids = df[id_col].to_numpy()[sel]
            sims = bq @ mat.T
            rows = []
            for i, qid in enumerate(bq_ids):
                s = sims[i].copy()
                s[ids == qid] = -np.inf
                for j in _topk_with_ties(s, k):
                    rows.append((float(s[j]), int(qid), int(ids[j])))
            return pd.DataFrame(rows,
                                columns=["cos", "query_id", "neighbor_id"])

        extra = ds.map_batches(pass2, batch_format="pandas",
                               batch_size=4096).to_pandas()
        cand = pd.concat([cand[["cos", "query_id", "neighbor_id"]], extra],
                         ignore_index=True)

    # a/b held cell ids + radius partials too, so they came back float
    cand = cand.astype({"query_id": "int64", "neighbor_id": "int64"})
    cand = cand.sort_values(["query_id", "cos", "neighbor_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id").head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "neighbor_id", "cos"]]


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
