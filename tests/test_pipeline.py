"""End-to-end pipeline tests: Ray pipeline vs single-process oracle
equality (the keep/drop + byte-identical extracted text invariant),
metrics, and checkpoint resume."""

import os

import pandas as pd
import pytest

from cld2_ray.functions import langs
from cld2_ray.functions.extract import extract_text, valid_utf8_prefix
from cld2_ray.functions.hints import page_hints
from cld2_ray.sources.pages import make_page, pages_dataset

N_PAGES = 120


def oracle_rows(n):
    """Single-process oracle over the same pages (no Ray)."""
    from cld2_ray.functions import fastlangid, perplexity
    from cld2_ray.functions.langid import Detector
    from cld2_ray.functions.quality import apply_rules
    from cld2_ray.functions.scrub import scrub_series

    det = Detector()
    rows = []
    for i in range(n):
        p = make_page(i)
        h = p["html"] or b""
        vp = valid_utf8_prefix(h)
        ok = vp == len(h)
        text = extract_text(h[:vp]) if vp else ""
        priors, declared, tld = page_hints(p["url"], h[:vp])
        if text:
            r = det.detect(text,
                           hint_langs=[lid for lid, w in priors if w > 0],
                           declared=frozenset(declared) or None)
            summary = r.summary_code
            reliable = r.is_reliable
            pct1 = r.percent3[0]
        else:
            summary, reliable, pct1 = "un", False, 0
        if summary == "un" and not reliable:
            fb = declared[0] if declared else tld
            summary = langs.lang_code(fb) if fb else "en"
        rows.append({"url": p["url"], "extracted_text": text,
                     "utf8_valid": ok, "lang_summary": summary,
                     "lang_reliable": reliable, "pct1": pct1})
    df = pd.DataFrame(rows)
    q = apply_rules(df.extracted_text, df.lang_summary)
    s = scrub_series(df.extracted_text)
    reason = q.drop_reason.mask(~df.utf8_valid, "utf8_invalid")
    lang_bad = (df.lang_summary == "un") | ~df.lang_reliable | (df.pct1 < 50)
    reason = reason.mask((reason == "") & lang_bad, "lang_filter")
    ppl, gib = perplexity.score_batch(df.extracted_text.tolist(),
                                      df.lang_summary.tolist())
    reason = reason.mask((reason == "") & pd.Series(gib), "perplexity")
    reason = reason.mask((reason == "") & s.has_toxicity, "toxicity")
    df["scrubbed_text"] = s.scrubbed_text
    df["drop_reason"] = reason
    df["keep"] = reason == ""
    return df


@pytest.fixture(scope="module")
def pipeline_df(ray_session):
    from cld2_ray.pipelines import flagship
    ds = pages_dataset(N_PAGES, seed=42)
    return flagship.build(ds).to_pandas().sort_values("url").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_df():
    return oracle_rows(N_PAGES).sort_values("url").reset_index(drop=True)


class TestOracleEquality:
    def test_extracted_text_byte_identical(self, pipeline_df, oracle_df):
        assert list(pipeline_df.extracted_text) == list(oracle_df.extracted_text)

    def test_keep_drop_identical(self, pipeline_df, oracle_df):
        assert list(pipeline_df.keep) == list(oracle_df.keep)
        assert list(pipeline_df.drop_reason) == list(oracle_df.drop_reason)

    def test_scrubbed_text_identical(self, pipeline_df, oracle_df):
        assert list(pipeline_df.scrubbed_text) == list(oracle_df.scrubbed_text)

    def test_langs_identical(self, pipeline_df, oracle_df):
        assert list(pipeline_df.lang_summary) == list(oracle_df.lang_summary)


class TestPipelineShape:
    def test_schema_columns(self, pipeline_df):
        from cld2_ray.pipelines.flagship import OUT_COLUMNS
        assert list(pipeline_df.columns) == OUT_COLUMNS

    def test_language_accuracy_on_clean_pages(self, pipeline_df):
        import numpy as np
        from cld2_ray.sources.pages import _CODES, _WEIGHTS
        clean = []
        for i in range(N_PAGES):
            rng = np.random.default_rng((42 << 32) ^ i)
            rng.choice(len(_CODES), p=_WEIGHTS)
            kind = rng.random()
            if 0.05 <= kind <= 0.9:  # exclude junk/empty/giant/mixed-risk
                clean.append(i)
        df = pipeline_df.set_index(
            pipeline_df.url.str.extract(r"/page/(\d+)$")[0].astype(int))
        hits = 0
        for i in clean:
            row = df.loc[i]
            truth = make_page(i)["lang"]
            got = {row.lang_summary, row.lang1, row.lang2, row.lang3}
            hits += truth in got
        assert hits / len(clean) >= 0.95

    def test_metrics_sum_to_total(self, ray_session):
        from cld2_ray.pipelines import flagship
        ds = pages_dataset(60, seed=7)
        m = flagship.metrics(flagship.build(ds))
        assert int(m.n_docs.sum()) == 60


class TestResume:
    def test_checkpoint_resume(self, ray_session, tmp_path):
        from cld2_ray.pipelines import flagship
        from cld2_ray.state import checkpoint as cp

        out = str(tmp_path / "out")

        def make_part(pid):
            return pages_dataset(30, seed=100 + pid)

        r1 = cp.run_resumable(make_part, 2, out, flagship.build)
        assert r1 == {"done": 2, "skipped": 0, "new_rows": 60}
        # second run skips everything
        r2 = cp.run_resumable(make_part, 2, out, flagship.build)
        assert r2 == {"done": 0, "skipped": 2, "new_rows": 0}
        # removing one manifest redoes exactly that partition
        os.remove(os.path.join(cp.partition_dir(out, 1), "MANIFEST.json"))
        r3 = cp.run_resumable(make_part, 2, out, flagship.build)
        assert r3 == {"done": 1, "skipped": 1, "new_rows": 30}

    @pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                        reason="multi-minute kill-and-resume identity "
                        "run; set RUN_SLOW=1 (scripts/resume_scale.py "
                        "runs the full 1.28M-page version — see "
                        "BASELINE.md for the recorded result)")
    def test_kill_resume_byte_identical(self, ray_session, tmp_path):
        """Crash-window resume (data written, manifest missing) must
        reproduce the uninterrupted run byte-for-byte."""
        import subprocess
        import sys as _sys
        env = dict(os.environ, GRAFT_RESUME_PAGES="64000",
                   RAY_GRAFT_CPUS="4")
        out = subprocess.run(
            [_sys.executable, os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
                "scripts", "resume_scale.py")],
            env=env, capture_output=True, text=True, timeout=1200)
        assert out.returncode == 0, out.stdout + out.stderr


class TestFusedEqualsModular:
    def test_row_identical(self, ray_session):
        from cld2_ray.pipelines import flagship
        a = flagship.build(pages_dataset(80, seed=42)).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        b = flagship.build_fused(pages_dataset(80, seed=42)).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        for col in a.columns:
            assert list(a[col]) == list(b[col]), f"column {col} differs"


class TestChunksColumn:
    """Opt-in ResultChunkVector output (public/compact_lang_det.h:146-153):
    chunks = list<struct{offset,bytes,lang}> in RAW page byte offsets."""

    HTML = ("<html><body><p>" + "The quick brown fox jumps over the lazy "
            "dog and the weather today is sunny with a chance of rain. " * 4
            + "</p><p>" + "Le renard brun rapide saute par-dessus le chien "
            "paresseux et le temps est ensoleillé avec de la pluie. " * 4
            + "</p></body></html>").encode("utf-8")

    def test_schema_and_spans(self, ray_session):
        import ray.data as rd
        from cld2_ray.pipelines import flagship
        ds = rd.from_items([{"url": "http://x.example/en-fr",
                             "warc_ts": 0, "lang": "en",
                             "html": self.HTML}])
        out = flagship.build_fused(ds, with_chunks=True)
        assert "chunks" in out.schema().names
        row = out.take_all()[0]
        chunks = row["chunks"]
        assert len(chunks) >= 2
        for c in chunks:
            assert set(c) == {"offset", "bytes", "lang"}
            assert 0 <= c["offset"] < len(self.HTML)
            assert c["offset"] + c["bytes"] <= len(self.HTML)
        # the known spans: English first, French second, offsets point
        # into the raw page at the right paragraph
        langs_seen = [c["lang"] for c in chunks]
        assert langs_seen[0] == "en" and "fr" in langs_seen
        fr = chunks[langs_seen.index("fr")]
        frag = self.HTML[fr["offset"]:fr["offset"] + fr["bytes"]]
        assert b"renard" in frag and b"quick brown" not in frag

    def test_opt_out_schema_unchanged(self, ray_session):
        from cld2_ray.pipelines import flagship
        from cld2_ray.pipelines.flagship import OUT_COLUMNS
        ds = pages_dataset(8, seed=42)
        assert flagship.build_fused(ds).schema().names == OUT_COLUMNS
        assert flagship.build(
            ds, with_chunks=True).schema().names == OUT_COLUMNS + ["chunks"]

    def test_modular_equals_fused_chunks(self, ray_session):
        import ray.data as rd
        from cld2_ray.pipelines import flagship
        ds = rd.from_items([{"url": "http://x.example/en-fr",
                             "warc_ts": 0, "lang": "en",
                             "html": self.HTML}])
        a = flagship.build(ds, with_chunks=True).take_all()[0]["chunks"]
        b = flagship.build_fused(ds, with_chunks=True).take_all()[0]["chunks"]
        assert a == b
