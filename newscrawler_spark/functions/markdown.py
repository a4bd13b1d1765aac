"""S9 — markdown rendering of an interleaved span document, as pure
JVM-side higher-order array functions (no UDF).

Reference semantics (studied, not ported):
/root/reference/news_extractor_core/services/formatter.py:8-61 —
title header, ordered contents where text → paragraph, image →
``![图片](url)``, video → ``[🎬 视频](url)``, blocks joined by blank
lines.  A pure function of the docs row → implemented as a derived
view, never stored.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def render_markdown(title: Column | str, spans: Column | str) -> Column:
    """Markdown string for one document row.

    spans: array<struct<kind,text,media_ref,offset>> — rendered in
    offset order; unknown kinds are skipped (defensive, same effect as
    the formatter's if/elif chain).
    """
    t = F.col(title) if isinstance(title, str) else title
    s = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(
        F.transform(s, lambda x: F.struct(x["offset"].alias("o"), x.alias("s")))
    )
    blocks = F.transform(
        ordered,
        lambda e: F.when(e["s"]["kind"] == "text", e["s"]["text"])
        .when(e["s"]["kind"] == "image", F.concat(F.lit("![图片]("), e["s"]["media_ref"], F.lit(")")))
        .when(e["s"]["kind"] == "video", F.concat(F.lit("[🎬 视频]("), e["s"]["media_ref"], F.lit(")")))
        .otherwise(F.lit(None)),
    )
    body = F.array_join(F.filter(blocks, lambda b: b.isNotNull()), "\n\n")
    return F.concat(F.lit("# "), F.coalesce(t, F.lit("")), F.lit("\n\n"), body)
