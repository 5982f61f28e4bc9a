"""Shared quality-gate rules for the curation pipeline family.

One spelling of the stage-1 reason codes, consumed by the batch
pipeline (queries/dedup.curation_verdict — q226/q227) and the
streaming ingest twin (streaming/curation_ingest) so the two can never
drift. The rules are q118's battery in first-failing order:

  eval_holdout  doc_id % eval_mod == 0 (the held-out slice is never
                training data — it is what decontamination protects)
  too_short     < 15 tokens
  too_long      > 5000 tokens
  repetitive    distinct/total token ratio < 0.2
  no_stopwords  English doc with zero common-stopword hits
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

QUALITY_STOPS = ("the", "a", "and", "of", "to", "is")


def quality_reason(doc_id: Column, toks: Column, lang: Column, eval_mod: int) -> Column:
    """First-failing stage-1 reason, NULL for a quality-passing doc.
    ``toks`` is the token array (operators/dedup.tokens)."""
    n_toks = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in QUALITY_STOPS])
        )
    )
    return (
        F.when(doc_id % eval_mod == 0, "eval_holdout")
        .when(n_toks < 15, "too_short")
        .when(n_toks > 5000, "too_long")
        .when(n_distinct.cast("double") / n_toks < 0.2, "repetitive")
        .when((lang == "en") & (n_stop < 1), "no_stopwords")
    )
