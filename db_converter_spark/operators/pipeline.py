"""Corpus filter chain — the C4/RefinedWeb-style keep/drop pipeline a
training-data build runs over raw documents: token statistics → quality
heuristics → language-profile signal → exact-dedup → one keep decision per
document with the reasons preserved.

This is the composition layer over the single-purpose operators (ta01-ta03
quality/langid, dd01 exact dedup): one pass, one plan. Scale shape: all
per-document metrics are array-domain expressions inside whole-stage
codegen (split → size/filter/aggregate — no UDFs, no explode), so the only
shuffle in the whole chain is the window over ``md5(text)`` for exact
dedup — uniform 128-bit keys, no skew. At 100 TB this runs scan-parallel
with exactly one exchange.

Reference parity: the reference has no corpus operators (it is a DB ops
engine); this family is the 100 TB-extension surface (SURVEY §6) — each
rule's thresholds follow the public C4 heuristics (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning": ≥3-sentence/length floors,
terminal punctuation, dedup) re-expressed as one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from db_converter_spark.operators.textops import LANG_PROFILES, _sql
from db_converter_spark.registry import query

_ALL_STOPWORDS = sorted({w for ws in LANG_PROFILES.values() for w in ws})


_STOPLIST = ", ".join(f"'{w}'" for w in _ALL_STOPWORDS)


def _pipe01(size_fn: str, filter_expr: str) -> str:
    return f"""
WITH stats AS (
  SELECT
    doc_id,
    lang,
    source,
    md5(text) AS content_hash,
    {size_fn}(string_split(text, ' ')) AS n_tokens,
    length(replace(text, ' ', '')) AS n_alpha_chars,
    {filter_expr} AS n_stopword_hits,
    length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '')) AS n_punct_chars,
    length(text) AS n_chars_total
  FROM documents
), scored AS (
  SELECT
    doc_id, lang, source, content_hash, n_tokens,
    CAST(ROUND(100.0 * n_alpha_chars / n_tokens) AS BIGINT) AS mean_word_len_x100,
    CAST(ROUND(1000.0 * n_stopword_hits / n_tokens) AS BIGINT) AS stopword_frac_x1000,
    CAST(ROUND(1000.0 * n_punct_chars / n_chars_total) AS BIGINT) AS punct_frac_x1000,
    ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS dup_rank
  FROM stats
  WHERE n_tokens > 0 AND n_chars_total > 0
)
SELECT
  doc_id,
  lang,
  source,
  n_tokens,
  mean_word_len_x100,
  stopword_frac_x1000,
  punct_frac_x1000,
  (dup_rank > 1) AS is_exact_dup,
  (n_tokens >= 5 AND n_tokens <= 100000
    AND mean_word_len_x100 >= 150 AND mean_word_len_x100 <= 1500
    AND punct_frac_x1000 <= 300) AS quality_ok,
  (dup_rank = 1
    AND n_tokens >= 5 AND n_tokens <= 100000
    AND mean_word_len_x100 >= 150 AND mean_word_len_x100 <= 1500
    AND punct_frac_x1000 <= 300) AS keep
FROM scored
"""


# dialect split: token-array size + lambda filter spell differently
_PIPE01_SPARK = _pipe01(
    "size",
    f"size(filter(split(text, ' '), w -> w IN ({_STOPLIST})))",
).replace("string_split", "split")
_PIPE01_DUCK = _pipe01(
    "len",
    f"len(list_filter(string_split(text, ' '), w -> w IN ({_STOPLIST})))",
)


@query("pipe01_corpus_filter", oracle=_PIPE01_DUCK, tags=("pipeline", "dedup", "quality"))
def pipe01_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus filter chain: per-document token/quality metrics,
    multilingual stopword signal, exact-dedup rank, and the final keep
    decision — metrics integer-scaled (x100/x1000) so the oracle compare
    is exact across engines."""
    return _sql(spark, sf_dir, _PIPE01_SPARK)
