"""parse_ok semantics on hostile input: malformed JSON must be FALSE,
NULL input NULL, valid objects TRUE — the engine-consistent contract
(Spark 4 PERMISSIVE ``from_json`` returns an all-null struct, never a
NULL struct, so bare ``.isNotNull()`` cannot detect parse failure)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parse_ok_detects_malformed_and_null(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": broken'),
            (3, None),
            (4, "not json at all"),
            (5, '{"other": 1}'),
        ],
        "event_id int, props string",
    )
    parsed = F.from_json(
        "props",
        "k INT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    parse_ok = F.when(
        F.col("props").isNull(), F.lit(None).cast("boolean")
    ).otherwise(parsed.getField("_corrupt_record").isNull())
    out = {
        r["event_id"]: (r["k"], r["ok"])
        for r in df.select(
            "event_id", parsed.getField("k").alias("k"), parse_ok.alias("ok")
        ).collect()
    }
    assert out[1] == (7, True)
    assert out[2] == (None, False)
    assert out[3] == (None, None)
    assert out[4] == (None, False)
    assert out[5] == (None, True)  # valid object, field absent
