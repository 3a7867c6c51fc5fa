"""Round-3 wave 62 (query #400): certified edit distance.

- edit1: the Wagner-Fischer edit-distance DP computed explicitly as a
  nested in-cell fold (rolling DP row), emitted BESIDE Spark's native
  levenshtein() — and the oracle compares against DuckDB's native
  levenshtein(). Three independent implementations (one hand-built DP
  and two engines' builtins) must produce identical distances on every
  pair — the strongest cross-check in the registry, closing the round
  at a fitting #400.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_EDIT1_SQL = """
WITH words AS (
  SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY word) AS BIGINT) AS i
  FROM (
    SELECT DISTINCT u.word
    FROM (SELECT list_filter(regexp_split_to_array(TRIM(text), '\\s+'),
                             t -> LENGTH(t) > 0) AS toks
          FROM documents) d,
         unnest(d.toks) AS u(word)
    WHERE LENGTH(u.word) BETWEEN 3 AND 12
  ) ORDER BY word LIMIT 31
), pairs AS (
  SELECT a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON b.i = a.i + 1
  WHERE a.i % 2 = 1
)
SELECT w1, w2,
       CAST(levenshtein(w1, w2) AS BIGINT) AS dp_distance,
       CAST(levenshtein(w1, w2) AS BIGINT) AS builtin_distance,
       TRUE AS implementations_agree
FROM pairs
"""


@_register("edit1_certified_levenshtein", _EDIT1_SQL)
def edit1_certified_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance three ways, all required to agree: the
    Wagner-Fischer DP built by hand as a nested in-cell fold (outer
    fold over w1's characters, inner fold building each rolling DP row
    left to right — the row cell depends on the cell just built, so
    the inner pass is itself a fold, the dtw1 nested shape), Spark's
    native levenshtein(), and — via the oracle — DuckDB's native
    levenshtein(). `implementations_agree` (hand DP == Spark builtin)
    must be TRUE on every row, and the value-hash parity against
    DuckDB's builtin closes the triangle: three codebases, one
    distance. Pairs are adjacent corpus words (fz1's family); Python's
    own DP re-certifies in the property layer as implementation #4."""
    from .operators.text import tokens as _tokens
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .where(F.length("word").between(3, 12))
        .distinct()
        .orderBy("word")
        .limit(31)
        .withColumn(
            "i", F.row_number().over(Window.orderBy("word")).cast("bigint")
        )
    )
    a = words.alias("a")
    b = words.alias("b")
    pairs = (
        a.join(b, F.col("b.i") == F.col("a.i") + 1)
        .where(F.col("a.i") % 2 == 1)
        .select(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
    )

    def dp_distance(w1, w2):
        n2 = F.length(w2)
        row0 = F.transform(
            F.sequence(F.lit(0), n2), lambda j: j.cast("bigint")
        )

        def outer_step(prev_row, i):
            c1 = w1.substr(i.cast("int"), F.lit(1))
            init = F.array(i.cast("bigint"))

            def inner_step(row_acc, j):
                c2 = w2.substr(j.cast("int"), F.lit(1))
                up = F.element_at(prev_row, (j + 1).cast("int"))
                left = F.element_at(row_acc, -1)
                diag = F.element_at(prev_row, j.cast("int"))
                cost = F.when(c1 == c2, 0).otherwise(1)
                cell = F.least(up + 1, left + 1, diag + cost)
                return F.concat(row_acc, F.array(cell))

            return F.aggregate(
                F.sequence(F.lit(1), n2), init, inner_step
            )

        final_row = F.aggregate(
            F.sequence(F.lit(1), F.length(w1)), row0, outer_step
        )
        return F.element_at(final_row, -1)

    return pairs.select(
        "w1",
        "w2",
        dp_distance(F.col("w1"), F.col("w2")).alias("dp_distance"),
        F.levenshtein("w1", "w2").cast("bigint").alias("builtin_distance"),
        (
            dp_distance(F.col("w1"), F.col("w2"))
            == F.levenshtein("w1", "w2").cast("bigint")
        ).alias("implementations_agree"),
    )
