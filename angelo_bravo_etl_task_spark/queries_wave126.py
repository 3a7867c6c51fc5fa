r"""Round-10 wave 126: synchronous label propagation (lp1) — the
community-detection classic the graph family (gr1 BFS, d6/d7 connected
components, pr1 PageRank, kc1 k-core, tc1 triangles, wl1
Weisfeiler-Lehman) was still missing.

Three synchronous LPA rounds over tc1's deterministic md5-mixed sparse
graph; each node adopts its neighbors' most frequent label with an
EXACT packed-integer argmax (count major, min-label tiebreak), so the
notoriously nondeterministic LPA becomes bit-reproducible — the only
form an oracle harness can certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _register, _t

_ROUNDS = 3

# One LPA round in SQL: count neighbor labels, then argmax via
# cnt * 1000 + (999 - lbl) — labels live in [0, 498] (node ids), so the
# packing is collision-free and MAX decodes to (max count, min label).
def _lpa_round_sql(prev: str, idx: int) -> str:
    return f"""c{idx} AS (
      SELECT a.n AS n, l.lbl AS lbl, COUNT(*) AS cnt
      FROM adj a JOIN {prev} l ON a.m = l.n
      GROUP BY 1, 2
    ), l{idx} AS (
      SELECT n,
             CAST(999 - MAX(cnt * 1000 + (999 - lbl)) % 1000 AS BIGINT)
               AS lbl
      FROM c{idx} GROUP BY n
    )"""


_LP1_SQL = f"""
WITH edges AS (
  SELECT DISTINCT LEAST(u0, v0) AS u, GREATEST(u0, v0) AS v
  FROM (
    SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-u'), 1, 4)
                AS INT) % 499 AS u0,
           CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '-v'), 1, 4)
                AS INT) % 499 AS v0
    FROM orders WHERE o_orderkey < 20000
  ) WHERE u0 <> v0
), adj AS (
  SELECT u AS n, v AS m FROM edges
  UNION ALL
  SELECT v AS n, u AS m FROM edges
), l0 AS (
  SELECT DISTINCT n, CAST(n AS BIGINT) AS lbl FROM adj
), {_lpa_round_sql("l0", 1)}, {_lpa_round_sql("l1", 2)},
{_lpa_round_sql("l2", 3)}, deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY n
)
SELECT l3.n AS node_id, l3.lbl AS label_3, deg.degree
FROM l3 JOIN deg ON l3.n = deg.n
"""


@_register("lp1_label_propagation", _LP1_SQL)
def lp1_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), 3 rounds over
    tc1's deterministic md5-mixed sparse graph (499 vertices, capped
    edge range so density is SF-independent): labels start as node ids
    and each round every node adopts the MOST FREQUENT label among its
    neighbors. LPA's textbook form is nondeterministic (random tie
    breaks, asynchronous order); this is the deterministic synchronous
    variant real distributed engines (GraphX/GraphFrames LPA) run, with
    ties resolved min-label through an exact packed-integer argmax
    (cnt * 1000 + (999 - lbl), labels < 1000 by construction) so both
    engines decode identical winners — the bon1 packing applied to
    graph aggregation. Released: final label + degree per node.

    100 TB shape: each round is the canonical Pregel superstep done
    relationally — ONE equi-join of the adjacency list with the label
    frame (keyed on the neighbor id) and TWO map-side-combinable
    aggregates ((node, label) counts, then per-node packed max). Cost
    per round ∝ |edges|; rounds unroll into one lazy plan exactly like
    pr1's damped iterations. The adjacency frame is checkpointed once
    and reused by every round + the degree aggregate. Reference parity:
    extends the §2.4 graph family; no reference analogue."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 20000)

    def mix(tag: str):
        h = F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(tag)))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 499

    raw = o.select(mix("-u").alias("u0"), mix("-v").alias("v0")).where(
        F.col("u0") != F.col("v0")
    )
    edges = raw.select(
        F.least("u0", "v0").alias("u"), F.greatest("u0", "v0").alias("v")
    ).distinct()
    adj = (
        edges.select(F.col("u").alias("n"), F.col("v").alias("m"))
        .unionAll(edges.select(F.col("v").alias("n"), F.col("u").alias("m")))
        .localCheckpoint(eager=True)  # consumed by every round + degree
    )
    labels = adj.select("n").distinct().select(
        "n", F.col("n").cast("bigint").alias("lbl")
    )
    for _ in range(_ROUNDS):
        neigh = adj.join(
            labels.select(F.col("n").alias("m"), "lbl"), "m"
        ).select("n", "lbl")
        counts = neigh.groupBy("n", "lbl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        labels = counts.groupBy("n").agg(
            (
                F.lit(999)
                - F.max(
                    F.col("cnt") * 1000 + (F.lit(999) - F.col("lbl"))
                )
                % 1000
            )
            .cast("bigint")
            .alias("lbl")
        )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return labels.join(deg, "n").select(
        F.col("n").alias("node_id"),
        F.col("lbl").alias("label_3"),
        "degree",
    )
