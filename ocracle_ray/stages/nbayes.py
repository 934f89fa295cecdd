"""Trained model-based classification — multinomial Naive Bayes over
the shared tokenization, self-trained on the corpus' own labels (the
GPT-3-style "model-based quality filtering" shape: fit a cheap linear
model on labeled text, broadcast it, score every document in one map
pass). docs_langid is the RULE-TABLE classifier; this is the TRAINED
counterpart, exactly SQL-mirrorable because training is closed-form
counting (add-1 smoothing), not SGD.

Model: ``score(doc, c) = ln(prior_c) + sum_tok ln((count(c,tok)+1) /
(total_c + V))`` over token occurrences; prediction = argmax with the
lexicographically-smallest-class tie-break. Per-doc scores round to 6
decimals BEFORE the argmax on both engine and oracle sides so float
summation order cannot flip a prediction (true inter-class margins are
orders of magnitude above the 1e-10 summation drift).

Two streaming passes (the stages/ngram_lm.py shape): pass 1 folds
per-batch (class, token, n) Arrow-grouped partials behind a LOUD
``MAX_NB_FEATURES`` guard (a bigger vocabulary needs a count-shuffle
pruning pass — a different op); pass 2 is an actor pool holding the
``ray.put`` model as per-class Arrow value sets, scoring with
``pc.index_in`` hash probes and emitting only per-(label, prediction)
partial counts. Per-doc rows never reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .ngram_lm import _doc_token_stream

MAX_NB_FEATURES = 2_000_000  # loud ceiling on the driver-folded model


def nb_train(ds, *, label_col: str = "lang",
             text_col: str = "text") -> dict:
    """Pass 1 -> closed-form model: per-class token counts/totals,
    per-class doc counts (priors) and the vocabulary size. Stream-fold
    of per-batch partials, guarded continuously."""

    def partial(t: pa.Table) -> pa.Table:
        parents, _prev, tok = _doc_token_stream(t[text_col])
        lab = t[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        tok_lab = lab.take(pa.array(parents, pa.int64()))
        g = pa.table({"c": tok_lab, "tok": tok}).group_by(
            ["c", "tok"]
        ).aggregate([("tok", "count")])
        g = g.rename_columns(["c", "tok", "n"])
        # doc-count rows ride along with a null token (never a real
        # token — _doc_token_stream drops empties)
        d = pa.table({"c": lab}).group_by(["c"]).aggregate([("c", "count")])
        d = pa.table(
            {
                "c": d["c"],
                "tok": pa.nulls(d.num_rows, pa.string()),
                "n": d["c_count"],
            }
        )
        return pa.concat_tables([g, d])

    part_ds = ds.map_batches(partial, batch_format="pyarrow")
    counts: dict = {}
    docs: dict = {}
    for bt in part_ds.iter_batches(batch_format="pyarrow"):
        for c, tok, n in zip(
            bt["c"].to_pylist(), bt["tok"].to_pylist(), bt["n"].to_pylist()
        ):
            if tok is None:
                docs[c] = docs.get(c, 0) + n
            else:
                k = (c, tok)
                counts[k] = counts.get(k, 0) + n
        if len(counts) > MAX_NB_FEATURES:
            raise ValueError(
                f"NB model exceeds MAX_NB_FEATURES={MAX_NB_FEATURES}: "
                "prune with a distributed count-shuffle pass first "
                "(different op)"
            )
    classes = sorted(docs)
    vocab = {t for (_c, t) in counts}
    model = {
        "classes": classes,
        "doc_counts": [int(docs[c]) for c in classes],
        "vocab_size": len(vocab),
        "tok": {c: [] for c in classes},
        "n": {c: [] for c in classes},
    }
    for (c, t), n in counts.items():
        model["tok"][c].append(t)
        model["n"][c].append(int(n))
    return model


class NBScorer:
    """Actor-pool batch scorer: per-class value-set probes, rounded
    per-doc scores, argmax with smallest-class tie-break."""

    def __init__(self, model_ref, *, label_col: str = "lang",
                 text_col: str = "text"):
        from ..broadcast import cached_get

        m = cached_get(model_ref)
        self.label_col = label_col
        self.text_col = text_col
        self.classes = m["classes"]  # sorted -> first-max = smallest
        nd = np.asarray(m["doc_counts"], np.float64)
        self.ln_prior = np.log(nd / nd.sum())
        v = float(m["vocab_size"])
        self.sets, self.lnp, self.ln_miss = [], [], []
        for i, c in enumerate(self.classes):
            n = np.asarray(m["n"][c], np.float64)
            total = n.sum()
            self.sets.append(pa.array(m["tok"][c], pa.string()))
            self.lnp.append(np.log((n + 1.0) / (total + v)))
            self.ln_miss.append(float(np.log(1.0 / (total + v))))

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        parents, _prev, tok = _doc_token_stream(t[self.text_col])
        scores = np.empty((n_docs, len(self.classes)), np.float64)
        for i in range(len(self.classes)):
            if len(tok):
                idx = pc.index_in(tok, value_set=self.sets[i])
                idx_np = idx.to_numpy(zero_copy_only=False)
                miss = idx.is_null().to_numpy(zero_copy_only=False)
                safe = np.where(miss, 0, idx_np).astype(np.int64)
                lp = np.where(miss, self.ln_miss[i], self.lnp[i][safe])
                tok_sum = np.bincount(parents, weights=lp,
                                      minlength=n_docs)
            else:
                tok_sum = np.zeros(n_docs)
            scores[:, i] = self.ln_prior[i] + tok_sum
        from ..core.textstats import round_half_away

        scores = round_half_away(scores, 6)
        best = np.argmax(scores, axis=1)  # first max = smallest class
        pred = pa.array(
            [self.classes[i] for i in best], pa.string()
        )
        return pa.table(
            {
                "lang": t[self.label_col],
                "pred_lang": pred,
                "score": pa.array(
                    scores[np.arange(n_docs), best], pa.float64()
                ),
            }
        )


def nb_confusion(ds, model, *, label_col: str = "lang",
                 text_col: str = "text",
                 concurrency: int = 2) -> pd.DataFrame:
    """Pass 2 + aggregate: per-(label, prediction) doc counts and the
    mean winning score. Per-doc rows never reach the driver."""
    import ray

    from ..pipelines.queries import driver_grouped_agg

    model_ref = ray.put(model)
    scored = ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={"model_ref": model_ref,
                               "label_col": label_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    out = driver_grouped_agg(
        scored,
        ["lang", "pred_lang"],
        {"n_docs": ("score", "count"), "sum_score": ("score", "sum")},
    )
    from ..core.textstats import round_half_away

    out["avg_score"] = round_half_away(out["sum_score"] / out["n_docs"], 4)
    return (
        out[["lang", "pred_lang", "n_docs", "avg_score"]]
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
