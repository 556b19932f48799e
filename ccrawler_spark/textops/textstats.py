"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

token_stats / quality_score / lang_id run their per-token loops as ONE
vectorized Arrow batch each (round 8, the same migration as
``dedup.simhash64``): Spark evaluates higher-order lambdas interpreted
(CodegenFallback, ~µs/element), and because the scalar form was an
inlinable expression tree the optimizer both (a) pushed the quality /
lang filters of composed pipelines BELOW the parallelizing repartition
— the whole interpreted token loop ran inside the one-split parquet
scan task — and (b) duplicated the evaluation (filter + projection),
the guide §4.4 pattern. The Arrow pass emits exact INTEGER counts
only; every double (ratios, the quality formula, the rounds) and the
lang-argmax stay in JVM expressions bit-identical to the previous
form, so the DuckDB twins in ``__spark_entry__.oracle_sql`` are
unchanged. Tokenization parity rules are ``simhash64``'s (ASCII
``\\s``, trim of 0x20 only, limit=-1 split); ``[^\\w\\s]`` with
``re.ASCII`` matches the JVM regex's ASCII ``\\w``/``\\s`` classes.
Each op has an exact DuckDB-SQL twin so the driver's correctness gate
checks values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    """Whitespace token count + char stats per doc. Counts are exact
    integers from one Arrow batch; the only double (avg_token_len) is
    the same JVM int/int division + round as the scalar form."""

    def cnt(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            n_chars, n_tok, n_dist = [], [], []
            for text in pdf["text"]:
                if text is None:
                    n_chars.append(None)
                    n_tok.append(None)
                    n_dist.append(None)
                    continue
                toks = ws.split(text.strip(" "))
                n_chars.append(len(text))
                n_tok.append(len(toks))
                n_dist.append(len(set(toks)))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_chars_actual": pd.array(n_chars, dtype="Int32"),
                "n_tokens": pd.array(n_tok, dtype="Int32"),
                "n_distinct_tokens": pd.array(n_dist, dtype="Int32"),
            })

    counts = docs.select("doc_id", "text").mapInPandas(
        cnt,
        "doc_id long, n_chars_actual int, n_tokens int,"
        " n_distinct_tokens int",
    )
    return counts.select(
        "doc_id", "n_chars_actual", "n_tokens", "n_distinct_tokens",
        F.round(
            F.col("n_chars_actual") / F.col("n_tokens"), 4
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristic in [0, 1]:
      0.4 · min(1, n_tokens/50) + 0.3 · (1 − punct_ratio·10 clamped)
      + 0.3 · min(1, stopword_ratio·5).

    The Arrow pass counts tokens / punct chars / stopwords (ints);
    the ratio + formula + round(…, 6) below are the identical JVM
    double expressions as the scalar form, so values are bit-equal."""

    def qcnt(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        punct = re.compile(r"[^\w\s]", re.ASCII)
        stop = frozenset(STOPWORDS)
        for pdf in batches:
            n_chars, n_tok, n_punct, n_stop = [], [], [], []
            for text in pdf["text"]:
                if text is None:
                    n_chars.append(None)
                    n_tok.append(None)
                    n_punct.append(None)
                    n_stop.append(None)
                    continue
                toks = ws.split(text.strip(" "))
                n_chars.append(len(text))
                n_tok.append(len(toks))
                n_punct.append(len(punct.findall(text)))
                n_stop.append(sum(t in stop for t in toks))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_chars": pd.array(n_chars, dtype="Int32"),
                "n_tok": pd.array(n_tok, dtype="Int32"),
                "n_punct": pd.array(n_punct, dtype="Int32"),
                "n_stop": pd.array(n_stop, dtype="Int32"),
            })

    counts = docs.select("doc_id", "text").mapInPandas(
        qcnt, "doc_id long, n_chars int, n_tok int, n_punct int, n_stop int"
    )
    n_tok = F.col("n_tok").cast("double")
    punct_ratio = F.col("n_punct").cast("double") / F.greatest(
        F.col("n_chars").cast("double"), F.lit(1.0)
    )
    stop_ratio = F.col("n_stop").cast("double") / F.greatest(n_tok, F.lit(1.0))
    score = (
        0.4 * F.least(F.lit(1.0), n_tok / 50.0)
        + 0.3 * F.greatest(F.lit(0.0), 1.0 - punct_ratio * 10.0)
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 5.0)
    )
    return counts.select(
        "doc_id",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word scoring: predicted lang = argmax over languages of
    marker hits (ties broken by language code ascending). Marker counts
    are exact ints from one Arrow batch; the argmax struct comparison
    (max score, then min rank) is the same JVM expression as before —
    per-row over 5 counts, not per-token."""
    codes = sorted(LANG_MARKERS)

    def lcnt(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        msets = [frozenset(LANG_MARKERS[c]) for c in codes]
        for pdf in batches:
            cols: list[list] = [[] for _ in codes]
            for text in pdf["text"]:
                if text is None:
                    for col in cols:
                        col.append(None)
                    continue
                toks = ws.split(text.strip(" "))
                for col, ms in zip(cols, msets):
                    col.append(sum(t in ms for t in toks))
            out = {"doc_id": pdf["doc_id"], "lang_label": pdf["lang"]}
            for c, col in zip(codes, cols):
                out[f"c_{c}"] = pd.array(col, dtype="Int32")
            yield pd.DataFrame(out)

    counts = docs.select("doc_id", "lang", "text").mapInPandas(
        lcnt,
        "doc_id long, lang_label string, "
        + ", ".join(f"c_{c} int" for c in codes),
    )
    # array_max on (score, lang) structs: max score, then max lang code —
    # to get ties → *ascending* code we compare on (score, negated rank)
    ranked = [
        F.struct(
            F.col(f"c_{c}").alias("score"),
            F.lit(-i).alias("rank"),
            F.lit(c).alias("lang"),
        )
        for i, c in enumerate(codes)
    ]
    best = F.array_max(F.array(*ranked))
    return counts.select(
        "doc_id",
        "lang_label",
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
