"""Corpus evaluation harness — the scoreutf8text.cc analogue.

Given an annotated dataset with a truth column and a prediction column,
produce the confusion matrix and per-language precision / recall / F1
(reference: internal/scoreutf8text.cc:30-130 builds the same matrix;
docs/evaluate_cld2_*.txt is its published output format).

The confusion matrix is the pipeline's one true groupby shuffle
(SURVEY.md §2.5 A3): partial per-batch counts -> groupby sum -> small
pandas finalize on the driver.
"""

from __future__ import annotations

import pandas as pd


def confusion_matrix(ds, truth_col: str = "lang",
                     pred_col: str = "lang_summary"):
    """Dataset -> (truth, pred, n) counts (Ray groupby)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame):
        import pyarrow as _pa
        g = df.groupby([truth_col, pred_col], as_index=False).size()
        g = g.rename(columns={truth_col: "lang_true",
                              pred_col: "lang_pred", "size": "n"})
        return _pa.Table.from_pandas(g, preserve_index=False)

    p = ds.map_batches(partial, batch_format="pandas")
    return p.groupby(["lang_true", "lang_pred"]).aggregate(
        Sum("n", alias_name="n"))


def precision_recall(conf: pd.DataFrame) -> pd.DataFrame:
    """Confusion counts -> per-language precision/recall/F1 + a
    _Totals_Known-style summary row (docs/evaluate_cld2_*.txt)."""
    tp = conf[conf.lang_true == conf.lang_pred].set_index("lang_true")["n"]
    by_true = conf.groupby("lang_true")["n"].sum()
    by_pred = conf.groupby("lang_pred")["n"].sum()
    langs_all = sorted(set(by_true.index) | set(by_pred.index))
    rows = []
    for lg in langs_all:
        t = int(tp.get(lg, 0))
        support = int(by_true.get(lg, 0))
        predicted = int(by_pred.get(lg, 0))
        prec = t / predicted if predicted else 0.0
        rec = t / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        rows.append({"lang": lg, "support": support, "predicted": predicted,
                     "tp": t, "precision": round(prec, 4),
                     "recall": round(rec, 4), "f1": round(f1, 4)})
    out = pd.DataFrame(rows)
    known = out[out.lang != "un"]
    tot_tp = known.tp.sum()
    tot_sup = known.support.sum()
    tot_pred = known.predicted.sum()
    prec = tot_tp / tot_pred if tot_pred else 0.0
    rec = tot_tp / tot_sup if tot_sup else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    totals = pd.DataFrame([{
        "lang": "_Totals_Known", "support": int(tot_sup),
        "predicted": int(tot_pred), "tp": int(tot_tp),
        "precision": round(prec, 4), "recall": round(rec, 4),
        "f1": round(f1, 4)}])
    return pd.concat([out, totals], ignore_index=True)


def evaluate(ds, truth_col: str = "lang",
             pred_col: str = "lang_summary") -> pd.DataFrame:
    conf = confusion_matrix(ds, truth_col, pred_col).to_pandas()
    return precision_recall(conf)
