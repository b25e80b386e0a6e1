"""§2.8 UDF/UDTF surface: Spark 4 Python UDTF (arrow-optimized) parity.

The repo's hot paths never use row-at-a-time Python (CLAUDE.md / SCALE.md
discipline) — every shipped kernel is either JVM built-ins or Arrow-batched
pandas. This module covers the remaining §2.8 API surface point: a Python
**UDTF** (table function, 1→N rows) exists, runs under the Arrow batch
path, and agrees exactly with the declarative explode/posexplode twin that
the shipped queries actually use. It is a PARITY EXHIBIT, not a recommended
plan shape — the declarative form is strictly faster and is what
doc_chunks_inventory / unpivot_metrics ship."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import Row


@udtf(returnType="doc_id: bigint, pos: int, token: string", useArrow=True)
class TokenizeUdtf:
    """1→N tokenizer table function: whitespace split + lowercase, same
    vocabulary as operators/text.py::tokens."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for pos, tok in enumerate(t for t in text.lower().split() if t):
            yield Row(doc_id=doc_id, pos=pos, token=tok)


def test_udtf_matches_declarative_explode(spark):
    from nilm_data_framework_spark.operators import text as T

    rows = [
        (1, "The quick  Brown fox"),
        (2, ""),
        (3, None),
        (4, "  leading and trailing  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", TokenizeUdtf)

    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT t.doc_id, t.pos, t.token FROM udtf_docs, "
            "LATERAL tokenize_udtf(doc_id, text) t"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in df.select(
            "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "token")
        ).collect()
    )
    assert got == want
    assert (1, 2, "brown") in got


def test_udtf_lateral_preserves_empty_and_null_docs(spark):
    # docs 2 (empty) and 3 (null) must yield no rows — not nulls, not errors
    df = spark.createDataFrame([(2, ""), (3, None)], "doc_id long, text string")
    df.createOrReplaceTempView("udtf_docs_empty")
    spark.udtf.register("tokenize_udtf2", TokenizeUdtf)
    out = spark.sql(
        "SELECT t.* FROM udtf_docs_empty, LATERAL tokenize_udtf2(doc_id, text) t"
    )
    assert out.count() == 0
