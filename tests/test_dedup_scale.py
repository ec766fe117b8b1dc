"""Scale-shaped dedup/similarity operators vs their oracles at sf0.001.

These pin the round-2 rewrites (no corpus broadcast, no driver-side
texts): exact distributed Jaccard join, cell-partitioned embedding
near-pairs, in-bucket-verified MinHash groups.
"""

import hashlib
import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.skipif(not os.path.exists(SF), reason="no testdata")
class TestJaccardExact:
    def test_matches_oracle(self, ray_session, con):
        from cld2_ray.pipelines.queries import (SQL_JACCARD_PAIRS,
                                                q_jaccard_pairs)
        mine = q_jaccard_pairs(SF).astype("int64")
        oracle = con.execute(SQL_JACCARD_PAIRS).df() \
            .sort_values(["a", "b"]).reset_index(drop=True).astype("int64")
        assert mine.equals(oracle)


@pytest.mark.skipif(not os.path.exists(SF), reason="no testdata")
class TestEmbeddingNearPairs:
    def test_matches_oracle(self, ray_session, con):
        from cld2_ray.pipelines.queries import (SQL_EMBEDDING_NEAR_PAIRS,
                                                q_embedding_near_pairs)
        mine = q_embedding_near_pairs(SF).astype("int64")
        oracle = con.execute(SQL_EMBEDDING_NEAR_PAIRS).df() \
            .sort_values(["a", "b"]).reset_index(drop=True).astype("int64")
        assert mine.equals(oracle)


@pytest.mark.skipif(not os.path.exists(SF), reason="no testdata")
class TestMinhashGroupsPinned:
    def test_groups_stable(self, ray_session):
        """Frozen snapshot of the sf0.001 near-dup groups for the
        PRODUCTION blake2b/64-hash variant (the registry query runs
        the md5 SQL-mirrored variant, verified against the DuckDB
        oracle instead; regenerate deliberately if the banding scheme
        changes)."""
        import ray.data as rd
        from cld2_ray.pipelines.dedup import minhash_dedup
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        g = minhash_dedup(ds)
        assert len(g) == 45
        assert g.group_id.nunique() == 21
        digest = hashlib.md5(
            ";".join(f"{int(a)}:{int(b)}"
                     for a, b in zip(g.doc_id, g.group_id)).encode()
        ).hexdigest()
        assert digest == "8d9787cd00e87d6d63f5b7d734cb8418"


class TestExchangeBlocks:
    def test_piece_size_floor(self):
        """The coalescing policy must keep every sort piece (map block
        x reduce partition, Ray's sort shuffle makes B x B pieces)
        above the ~100KB owner-inline threshold for any volume — the
        hazard measured in BASELINE.md's owner-inline sweeps."""
        from cld2_ray.pipelines.shuffle import exchange_blocks
        for vol in (1, 10 << 20, 294 << 20, 2088 << 20, 10 << 30,
                    17 << 30, 26 << 30, 100 << 30, 1 << 40):
            b = exchange_blocks(vol)
            assert 8 <= b <= 512
            if vol >= (8 * 8) * 100_000:      # below: volume itself
                # is inline-sized and harmless
                assert vol / (b * b) > 100_000, (vol, b)

    def test_coalesced_repartitions(self, ray_session):
        import ray.data as rd
        from cld2_ray.pipelines.shuffle import coalesced
        ds = rd.range(10_000).materialize()
        out = coalesced(ds)
        assert out.count() == 10_000
        assert out.materialize().num_blocks() == 8   # min clamp
