"""Substring-level (duplicated-span) dedup queries.

In their own module, imported LAST by registry._load_all, so these
oracle-backed entries register AFTER the 50 entries inside the
driver's adjudication window — oracle-ready without displacing any
adjudicated slot. The SQL text is executed against DuckDB by
tests/test_dedup.py::test_span_oracles_match_duckdb."""

from __future__ import annotations

from clickhouse_observability_spark.operators import dedup as D
from clickhouse_observability_spark.registry import register, table

_NORM = r"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"
_NTOKS = rf"list_filter(regexp_split_to_array({_NORM}, '\s+'), x -> x <> '')"

_SPAN_K = 8
# duplicated 8-gram positions per doc, shared by both span oracles
_SPAN_POSITIONS = rf"""
    toks AS (SELECT doc_id, {_NTOKS} AS t FROM documents),
    g AS (SELECT doc_id, i AS pos,
                 array_to_string(t[i:i+{_SPAN_K}-1], ' ') AS gram
          FROM toks, unnest(range(1, len(t) - {_SPAN_K} + 2)) AS r(i)
          WHERE len(t) >= {_SPAN_K}),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    p AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
    m AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER w IS NULL
                        OR pos > lag(pos) OVER w + {_SPAN_K}
                      THEN 1 ELSE 0 END AS brk
          FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    gr AS (SELECT doc_id, pos,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS grp
           FROM m),
    spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
                     (max(pos) + {_SPAN_K} - 1)::BIGINT AS span_end,
                     count(*)::BIGINT AS n_grams
              FROM gr GROUP BY doc_id, grp)
"""


@register(
    "dedup_exact_spans",
    # oracle-ready; sits after the driver's 50-entry adjudication
    # window, so the SQL text itself is executed by
    # tests/test_text.py::test_span_oracles_match_duckdb
    oracle=f"WITH {_SPAN_POSITIONS} SELECT * FROM spans",
)
def dedup_exact_spans(spark, sf_dir):
    """Substring-level dedup, detection half: maximal token spans in
    which every 8-token window recurs somewhere in the corpus — the
    distributed ExactSubstr (suffix-array dedup) re-expression. See
    operators/dedup.py:duplicated_spans for the plan shape."""
    return D.duplicated_spans(table(spark, sf_dir, "documents"), k=_SPAN_K)


@register(
    "dedup_span_removal",
    # oracle-ready (outside the window; executed by the same pytest).
    # DuckDB list lambdas take an optional 1-BASED element index —
    # mirrors the Spark side's 0-based transform index + 1.
    oracle=f"""
    WITH {_SPAN_POSITIONS},
    cov AS (SELECT doc_id, list(ti) AS cover
            FROM (SELECT doc_id, unnest(range(span_start, span_end + 1)) AS ti
                  FROM spans)
            GROUP BY doc_id),
    kept AS (SELECT t.doc_id,
                    list_filter(t.t, (x, i) ->
                        NOT list_contains(coalesce(cov.cover, []), i)) AS kt,
                    len(t.t) AS n0
             FROM toks t LEFT JOIN cov ON t.doc_id = cov.doc_id)
    SELECT doc_id,
           -- DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
           coalesce(array_to_string(kt, ' '), '') AS clean_text,
           (n0 - len(kt))::INT AS n_tokens_removed
    FROM kept
    """,
)
def dedup_span_removal(spark, sf_dir):
    """Substring-level dedup, removal half: every token covered by a
    duplicated span dropped (drop-all-copies policy; divergence note
    in the operator docstring). Output is the cleaned corpus plus the
    removal count per doc — the frame a training pipeline feeds to
    packing instead of the raw text."""
    docs = table(spark, sf_dir, "documents")
    spans = D.duplicated_spans(docs, k=_SPAN_K)
    return D.remove_duplicated_spans(docs, spans)
