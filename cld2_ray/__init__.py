"""cld2_ray — a Ray-Data-native language-ID + quality-filter + PII-scrub engine.

A from-scratch rebuild of the data-processing capabilities of CLD2
(Compact Language Detector 2, reference at /root/reference) as an
idiomatic Ray Data pipeline: `ray.data.Dataset` -> vectorized
`map_batches` over zero-copy Arrow batches, stateful actor pools for the
stages that hold immutable model tables (quadgram/unigram Naive-Bayes
scoring tables, char-n-gram LM, hashed-n-gram classifier), and
groupby/aggregate shuffles only for the wide metric/eval steps.

Layout:
  functions/  pure vectorized kernels (no Ray imports)
  stages/     map_batches callables / actor-pool classes
  sources/    readers + deterministic synthetic pages generator
  pipelines/  end-to-end Dataset pipelines (flagship quality filter, dedup, ANN)
  state/      model-table build/load + checkpoint/lineage manifest
  data/       deterministic seed corpora (authored, no external data)
"""

__version__ = "0.1.0"

_DETECTOR = None


def _detector():
    global _DETECTOR
    if _DETECTOR is None:
        from cld2_ray.functions.langid import Detector
        _DETECTOR = Detector()
    return _DETECTOR


def detect_language(content, is_plain_text: bool = True,
                    url: str = "", best_effort: bool = False,
                    default_to_english: bool = False):
    """Single-call analogue of the reference's public entry points
    (DetectLanguage / ExtDetectLanguageSummaryCheckUTF8,
    compact_lang_det.h:236-338): pass raw HTML bytes with
    ``is_plain_text=False`` to get UTF-8 validation + tag/entity
    extraction + TLD/lang-attr hints, or an already-extracted str with
    the default. Returns a DetectResult (summary_code, language3,
    percent3, normalized_score3, is_reliable, text_bytes).

    This is the interactive convenience path — batch pipelines should
    use Detector.detect_batch inside map_batches (see
    pipelines/flagship.py) so table loads amortize per worker."""
    det = _detector()
    hints = None
    if is_plain_text and isinstance(content, bytes):
        # the reference's buffer parameter is bytes: validate and
        # decode the valid UTF-8 prefix (CheckUTF8 behavior)
        from cld2_ray.functions.extract import valid_utf8_prefix
        content = content[:valid_utf8_prefix(content)].decode("utf-8")
    if not is_plain_text:
        from cld2_ray.functions.extract import (extract_text,
                                                valid_utf8_prefix)
        from cld2_ray.functions.hints import hints_from_page
        raw = content if isinstance(content, bytes) \
            else content.encode("utf-8")
        vp = valid_utf8_prefix(raw)
        hints = hints_from_page(url, raw)
        content = extract_text(raw[:vp]) if vp else ""
    return det.detect(content, best_effort=best_effort,
                      hint_langs=hints,
                      default_to_english=default_to_english)
