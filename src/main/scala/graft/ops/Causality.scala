package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P1: causality conflict detection
  * (ref: pkg/loader/causality.go:35-96 — every DML carries the set of its
  * unique-key value tuples (`getKeys`, pkg/loader/model.go:473-512); DMLs
  * whose key sets intersect, transitively, form a conflict group that must
  * apply in order on one worker).
  *
  * In Spark the per-key ordering itself comes free from the shuffle
  * (repartition by key), so the reference's *dispatch* machinery is designed
  * out — but the conflict-group structure is still the right primitive when
  * a DML carries multiple unique keys (a pk plus a secondary unique index):
  * group = connected component of the bipartite event↔key graph.
  *
  * Implementation: iterative min-label propagation over the key co-occurrence
  * edge list — the standard shuffle-parallel connected-components loop
  * (each round one join + one aggregate; lineage cut per round with an eager
  * local checkpoint). Rounds are bounded by component diameter, which for
  * conflict graphs is small; every round is a plain shuffle join that scales
  * with executors. No driver-side state beyond the loop counter.
  *
  * Key model on the events table: every event's primary key is `pk`; events
  * with value > 300 additionally carry their `props.k` as a secondary unique
  * key (offset into a disjoint node-id space). The oracle computes the same
  * components with a recursive CTE.
  */
object Causality {

  private val UkOffset = 1000000L

  def conflictGroups(spark: SparkSession, dir: String): DataFrame = {
    val ev = Cdc.changes(spark, dir)
    val withUk = ev.select(
      col("commit_ts"), col("pk"),
      when(col("value") > 300.0,
        get_json_object(col("props"), "$.k").cast("long") + UkOffset).as("uk"))

    // undirected edge list between the pk node and the secondary-key node
    val half = withUk.filter(col("uk").isNotNull)
      .select(col("pk").as("src"), col("uk").as("dst")).distinct()
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    val labels = connectedComponents(edges)

    ev.select(col("commit_ts"), col("pk"))
      .join(labels, col("pk") === col("node"), "left")
      .select(col("commit_ts"), col("pk"),
        coalesce(col("label"), col("pk")).as("group_id"))
  }

  /** Min-label-propagation connected components over an undirected edge list
    * (`src`/`dst` long columns, both directions present). Returns
    * (node, label) where label = the component's minimum node id.
    *
    * Only nodes with at least one edge participate; everything else is its
    * own singleton component, so per-iteration cost is proportional to the
    * conflict/near-dup subgraph, not the corpus — which is what makes the
    * fixpoint loop viable at 100 TB. Lineage is cut per round with an eager
    * local checkpoint; rounds are bounded by component diameter.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val viaNeighbor = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .unionByName(viaNeighbor)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      labels = next
    }
    labels
  }

  def conflictGroupsSql: String =
    s"""WITH RECURSIVE c AS (${Cdc.changesCte}),
       |k AS (
       |  SELECT commit_ts, pk,
       |    CASE WHEN value > 300.0
       |         THEN CAST(props->>'$$.k' AS BIGINT) + $UkOffset END AS uk
       |  FROM c),
       |half AS (SELECT DISTINCT pk AS src, uk AS dst FROM k WHERE uk IS NOT NULL),
       |edges AS (
       |  SELECT src, dst FROM half
       |  UNION ALL SELECT dst, src FROM half),
       |nodes AS (
       |  SELECT DISTINCT pk AS node FROM k
       |  UNION SELECT DISTINCT uk FROM k WHERE uk IS NOT NULL),
       |reach(node, label) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node),
       |labels AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
       |SELECT c.commit_ts, c.pk, l.label AS group_id
       |FROM c JOIN labels l ON c.pk = l.node""".stripMargin
}
