"""Log template mining (LogReduce/Drain-style, expression-only).

Observability suites cluster raw log lines into TEMPLATES — the
constant skeleton with the variable fields masked — so a million
"Order 12346 has pending items" lines collapse to one pattern with a
count. The reference's msg traffic (README.md:86) is exactly this
shape.

Spark-first: masking is a fixed regexp_replace chain (one codegen
stage, no UDF, no shuffle), and the cluster step is an ordinary
groupBy on the masked skeleton — map-side combined, output bounded
by template cardinality (thousands), not line count. That is the
whole 100 TB story: the only shuffle carries (template, partial
count) rows.

Masking order matters: composite shapes (IPv4, email) are swallowed
first so the generic <NUM>/<HEX> passes cannot shred them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement), applied in order.
MASKS: tuple[tuple[str, str], ...] = (
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
    # long hex runs (ids, hashes, uuid segments) before plain numbers
    (r"\b[0-9a-fA-F]{8,}\b", "<HEX>"),
    (r"\b[0-9]+\b", "<NUM>"),
)


def mask_template(text: Column) -> Column:
    out = text
    for pat, rep in MASKS:
        out = F.regexp_replace(out, pat, rep)
    return out


def mine_templates(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(template, n_lines, example) — example is the lexicographic
    min of the raw lines (deterministic across engines/partitions)."""
    t = df.select(
        mask_template(F.col(text_col)).alias("template"),
        F.col(text_col).alias("__raw"),
    )
    out = t.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("__raw").alias("example"),
    )
    if min_count > 1:
        out = out.filter(F.col("n_lines") >= min_count)
    return out


def new_templates(
    current: DataFrame,
    baseline: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Templates present in `current` but NEVER seen in `baseline` —
    the "a new error shape just appeared" alert (and, for a training
    corpus, "the new crawl snapshot contains novel content shapes").
    Both sides mask map-only; the baseline collapses to its DISTINCT
    template set (template-cardinality-sized — thousands of rows at
    any corpus scale) before a left-anti join on the skeleton, so the
    one shuffle carries (template, partial count) rows, never lines.

    Output: (template, n_lines, example) for the novel templates,
    counted over `current`.
    """
    cur = mine_templates(current, text_col)
    base = (
        baseline.select(mask_template(F.col(text_col)).alias("template"))
        .distinct()
    )
    return cur.join(base, "template", "left_anti")
