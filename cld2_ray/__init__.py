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
