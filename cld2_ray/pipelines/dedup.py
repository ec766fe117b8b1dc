"""Cross-document deduplication operators (training-data pipeline ops).

All four families from the task brief, Ray-Data-first:

* exact        — content hash -> groupby(hash) keep min id. The hash
                 column is added vectorized per batch; the groupby is
                 the only shuffle.
* minhash LSH  — word-shingle -> 64 minhashes -> 16 bands of 4 ->
                 explode (band, band_hash) rows -> groupby -> candidate
                 pairs -> exact Jaccard verify -> connected components.
* simhash      — 64-bit weighted-feature fingerprint; near-dup =
                 Hamming distance <= 3, found via 4x16-bit band
                 bucketing (any duplicate pair agrees on >= 1 band by
                 pigeonhole when distance <= 3).
* embedding    — cosine near-dup pairs over a list<float> column,
                 blocked matmul per batch against a broadcast matrix.

Scale notes: band-bucket groupbys shuffle only (band_key, doc_id)
pairs — tiny compared to the corpus; candidate verification is
per-bucket; connected components run driver-side on the candidate
EDGES only (bounded: near-dup pairs, not the corpus). At 100 TB the
same shape holds with the verify step inside map_groups per bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_M61 = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (uint64)."""
    words = text.split()
    if len(words) < k:
        words = words + ["<pad>"] * (k - len(words))
    joined = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "little") for s in joined),
        dtype=np.uint64, count=len(joined))
    return out


_RNG = np.random.default_rng(12345)
_A = (_RNG.integers(1, _M61, size=64, dtype=np.int64)).astype(np.uint64)
_B = (_RNG.integers(0, _M61, size=64, dtype=np.uint64))


def minhash_signature(text: str) -> np.ndarray:
    """64 minhashes (uint64) of the word-3-shingle set."""
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return np.zeros(64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        prods = (sh[None, :] * _A[:, None] + _B[:, None])
    return prods.min(axis=1)


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """Band keys: hash of each 4-row band."""
    rows = len(sig) // n_bands
    out = []
    for b in range(n_bands):
        band = sig[b * rows:(b + 1) * rows].tobytes()
        h = int.from_bytes(hashlib.blake2b(band, digest_size=8).digest(),
                           "little")
        out.append(h)
    return out


def simhash64(text: str) -> int:
    """64-bit simhash over word-3-shingle hashes."""
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def jaccard(a: str, b: str) -> float:
    sa, sb = set(_shingle_hashes(a).tolist()), set(_shingle_hashes(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _union_find(n_ids: list, edges: list[tuple]) -> dict:
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


# --- Ray pipelines ---------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset -> (hash groups with survivor id + count). The groupby
    runs on the md5 column, not the full text."""
    from ray.data.aggregate import Count, Min

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].copy()
        df["content_md5"] = df[text_col].fillna("").map(
            lambda t: hashlib.md5(t.encode()).hexdigest())
        return df.drop(columns=[text_col])

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    return hashed.groupby("content_md5").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies"))


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8) -> pd.DataFrame:
    """Near-duplicate groups via MinHash-LSH. Returns a pandas frame
    (doc_id, group_id) for docs in near-dup groups of size > 1."""
    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(df[id_col], df[text_col].fillna("")):
            sig = minhash_signature(text)
            for band_id, key in enumerate(minhash_bands(sig)):
                rows.append((did, band_id, key))
        return pd.DataFrame(rows, columns=[id_col, "band_id", "band_key"])

    bands = ds.map_batches(to_bands, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        # pair every member with the smallest (star, not clique): enough
        # for connectivity, linear not quadratic in bucket size
        return pd.DataFrame({"a": [ids[0]] * (len(ids) - 1), "b": ids[1:]})

    cand = bands.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    cand = cand.drop_duplicates()
    if len(cand) == 0:
        return pd.DataFrame({id_col: [], "group_id": []})

    # verify with exact Jaccard on the candidate docs only
    need = sorted(set(cand.a) | set(cand.b))
    texts = {r[id_col]: r[text_col]
             for r in ds.filter(expr=f"{id_col} in {need}")
             .select_columns([id_col, text_col]).take_all()}
    edges = [(int(a), int(b)) for a, b in zip(cand.a, cand.b)
             if jaccard(texts.get(int(a), ""), texts.get(int(b), "")) >= threshold]
    comp = _union_find(need, edges)
    rows = [(i, g) for i, g in comp.items()]
    df = pd.DataFrame(rows, columns=[id_col, "group_id"])
    sizes = df.groupby("group_id")[id_col].transform("count")
    return df[sizes > 1].sort_values(id_col).reset_index(drop=True)


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> pd.DataFrame:
    """Near-duplicate pairs via SimHash banding. Returns (a, b, hamming)."""
    def add_sim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col]].copy()
        out["simhash"] = df[text_col].fillna("").map(simhash64).astype("uint64")
        return out

    sims = ds.map_batches(add_sim, batch_format="pandas")

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, sh in zip(df[id_col], df["simhash"]):
            sh = int(sh)
            for band in range(4):
                rows.append((did, sh, band, (sh >> (band * 16)) & 0xFFFF))
        return pd.DataFrame(rows, columns=[id_col, "simhash", "band_id",
                                           "band_key"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[[id_col, "simhash"]].drop_duplicates().sort_values(id_col)
        rows = []
        vals = list(zip(ids[id_col], ids["simhash"]))
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                h = bin(int(vals[i][1]) ^ int(vals[j][1])).count("1")
                if h <= max_hamming:
                    rows.append((vals[i][0], vals[j][0], h))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    pairs = sims.map_batches(to_bands, batch_format="pandas") \
        .groupby(["band_id", "band_key"]).map_groups(
            bucket_pairs, batch_format="pandas").to_pandas()
    return pairs.drop_duplicates(["a", "b"]).sort_values(["a", "b"]) \
        .reset_index(drop=True)


def embedding_near_pairs(ds, threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> pd.DataFrame:
    """Cosine near-duplicate pairs (a < b, cosine > threshold).

    All vectors are broadcast once via ray.put (the small side); each
    batch does one matmul against the broadcast matrix — no shuffle.
    """
    import ray

    all_df = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = all_df[id_col].to_numpy()
    mat = np.stack(all_df[vec_col].to_numpy())
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        bids, bmat = ray.get(ref)
        q = np.stack(df[vec_col].to_numpy())
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ bmat.T
        qa = df[id_col].to_numpy()
        rows = []
        for i in range(len(qa)):
            hit = np.flatnonzero(sims[i] > threshold)
            for j in hit:
                if qa[i] < bids[j]:
                    rows.append((int(qa[i]), int(bids[j])))
        return pd.DataFrame(rows, columns=["a", "b"], dtype="int64")

    out = ds.map_batches(pairs_batch, batch_format="pandas",
                         batch_size=1024).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
