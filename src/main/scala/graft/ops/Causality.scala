package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Key model on the events table (mirrors `getKeys` key-set construction,
  * pkg/loader/model.go:473-512 — ALL unique indexes contribute, and an
  * update contributes its OLD-image key values as well as the new ones):
  *
  *  - primary key: `pk` (always present);
  *  - UK1, a secondary unique index on `props.k`: present when value > 300;
  *  - UK2, a second unique index on the value bucket: present for
  *    'purchase' rows;
  *  - updates (op = 'U') additionally contribute the OLD image's UK1/UK2 —
  *    reconstructed as the previous row image per pk (same lag-window
  *    pattern as the T8 update-image split), so an update whose key column
  *    changed bridges the group owning the old key value with the group
  *    owning the new one, exactly like the reference's old+new key union.
  *
  * Each UK family is offset into its own disjoint node-id space. The oracle
  * computes the same components with a recursive CTE.
  */
object Causality {

  // Disjoint node-id namespaces via high-range offsets: the pk space owns
  // [0, 2^61), UK1 sits at +2^61, UK2 at +2^62. The earlier +1e6/+2e6
  // offsets collided at production id ranges (a pk ≥ 1e6 aliased a UK1
  // node, silently fusing unrelated histories into one group — too-coarse
  // is safe but serializes the apply and corrupts group identity). Ids are
  // assumed < 2^61; the oracle SQL interpolates the SAME constants, so
  // both engines shift identically and the hash gate stays aligned.
  private[graft] val Uk1Offset = 1L << 61
  private[graft] val Uk2Offset = 1L << 62

  /** The namespace invariant, CHECKED: an id outside [0, 2^61) would
    * alias another namespace's node (a negative uk1 key lands in pk
    * space, a negative uk2 value just below 2^62 lands in uk1 space) and
    * silently fuse unrelated histories — exactly the corruption the
    * offsets exist to prevent. One codegen'd comparison per row. */
  private def nsChecked(id: Column, what: String): Column =
    when(id < 0 || id >= Uk1Offset,
      raise_error(concat(lit(s"$what outside the [0, 2^61) node namespace: "),
        id.cast("string"))).cast("long"))
      .otherwise(id)

  /** The per-event key set: (commit_ts, pk, array of present unique keys).
    * One shuffle on pk for the old-image lag; everything else is a
    * projection. */
  private def eventKeys(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts")
    def uk1(value: Column, k: Column): Column =
      when(value > 300.0, nsChecked(k, "uk1 key") + Uk1Offset)
    def uk2(eventType: Column, value: Column): Column =
      when(eventType === "purchase",
        nsChecked(floor(value).cast("long"), "uk2 key") + Uk2Offset)
    // NOT spread (r21, measured): a pk-keyed spread reused by the window
    // looked free, but pinning the label/edge frames at cores-width
    // multiplied the CC loop's per-round task overhead past the JSON-parse
    // win (paired TimeQ 1.22×) — the loop's frames are tiny and
    // AQE-coalesced by design
    Cdc.changes(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_k", lag("k", 1).over(w))
      .select(col("commit_ts"), col("pk"),
        uk1(col("value"), col("k")).as("uk1_new"),
        uk2(col("event_type"), col("value")).as("uk2_new"),
        when(col("op") === "U", uk1(col("prev_value"), col("prev_k"))).as("uk1_old"),
        when(col("op") === "U", uk2(col("prev_type"), col("prev_value"))).as("uk2_old"))
  }

  def conflictGroups(spark: SparkSession, dir: String): DataFrame =
    conflictGroupsFromKeys(eventKeys(spark, dir))

  /** Conflict groups from an explicit key-set frame — (commit_ts, pk,
    * uk1_new, uk2_new, uk1_old, uk2_old), nullable uk columns. Exposed
    * separately so callers holding real before-images (a CDC update row
    * carries both) can feed them directly, exactly like `getKeys` unions
    * old+new key values for updates: an update whose unique key moved from
    * a value owned by group A to one owned by group B merges the two. */
  def conflictGroupsFromKeys(keys: DataFrame): DataFrame = {
    // undirected edges between the pk node and every present unique-key
    // node: the event is the hyperedge, the pk its hub
    val half = Seq("uk1_new", "uk2_new", "uk1_old", "uk2_old")
      .map(c => keys.filter(col(c).isNotNull)
        // pk owns [0, 2^61): a pk past the offset would alias a UK node
        .select(nsChecked(col("pk"), "pk node").as("src"), col(c).as("dst")))
      .reduce(_ unionByName _)
      .distinct()
    // no checkpoint here: connectedComponents repartitions and materializes
    // the edge list itself (keyed on its per-round join key)
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))

    val labels = connectedComponents(edges)

    keys.select(col("commit_ts"), col("pk"))
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
    * local checkpoint.
    *
    * The initial labels come from one aggregate over the edge list
    * (label₀ = min(node, neighbors)) — the first propagation round fused
    * into initialization, so there is no separate distinct-nodes pass and
    * the loop starts one round ahead. Iteration is SEMI-NAIVE (delta):
    * labels only decrease, so a node that did not change last round has
    * nothing new to offer its neighbors — each round joins the edge list
    * against only the changed-label delta, which shrinks geometrically
    * (measured on the conflict graph: 1499 → 396 → 140 → 6 → 0), so tail
    * rounds cost almost nothing even though the edge list is large. The
    * old label rides along into the materialized frame so the convergence
    * check is a plain filter over the checkpoint, not a second
    * join-shuffle. (A pointer-jumping variant was measured and rejected:
    * conflict/near-dup components have tiny diameters, so the extra
    * per-round join costs more than the rounds it saves.) */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // Partition the edge list by the join key ONCE: every round joins on
    // edges.dst, and a hash-partitioned, materialized edge frame satisfies
    // that join's distribution requirement, so only the (node-sized) label
    // and delta frames shuffle per round. At scale the edge list is the big
    // side — shuffling it once instead of once per round is the difference
    // between O(E) and O(E · rounds) network traffic.
    val e = edges.repartition(col("dst")).localCheckpoint(true)
    // round 0 fused into init: label = min(self, direct neighbors)
    var labels = e.groupBy(col("src").as("node"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(true)
    // every node's initial label is news it has not yet announced
    var delta = labels
    var changed = 1L
    while (changed > 0) {
      val offers = e.join(delta, e("dst") === delta("node"))
        .groupBy(e("src").as("node")).agg(min("label").as("nbr"))
      val next = labels
        .join(offers, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint(true)
      delta = next.filter(col("label") =!= col("old")).select("node", "label")
      changed = delta.count()
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"CC round changed=$changed")
      labels = next.select("node", "label")
    }
    labels
  }

  /** Alternating large-star / small-star connected components (the
    * MapReduce-era star-contraction algorithm; see Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Same
    * contract as [[connectedComponents]]: undirected edge list (both
    * directions or either — symmetrized here) → (node, label) with label =
    * component minimum id.
    *
    * Why a second fixpoint loop: label propagation converges in
    * O(diameter) rounds — ideal for the squat conflict/near-dup graphs it
    * serves, but a chain-shaped component of 100k nodes (a template
    * corpus where doc i nearly-duplicates doc i+1) needs 100k rounds.
    * Star contraction halves long paths every large+small round, so it
    * converges in O(log² n) rounds on ANY component shape; each round is
    * two grouped aggregates + two joins, all hash-partitioned on node id.
    * This is the drop-in upgrade the cluster ops switch to when component
    * diameters are unknown.
    *
    * Round mechanics (edge set kept canonical: `hi` > `lo`, distinct):
    *  - large-star: every neighbor v > u re-attaches to m(u) = min of u's
    *    closed neighborhood — long tails fold onto local minima;
    *  - small-star: every smaller neighbor (and u itself) attaches to the
    *    minimum of u's smaller closed neighborhood — stars flatten.
    * The edge multiset's total weight strictly decreases until the graph
    * is a union of stars centered on component minima; convergence is
    * detected by a one-row (count, xor-of-hash) fingerprint on each
    * checkpointed frame — a full `except` (shuffle+distinct of both
    * frames) runs only when the fingerprints tie, to rule out the
    * astronomically-unlikely hash-xor collision. In the converging tail,
    * where counts are equal round after round, this replaces the except
    * that used to double per-round cost with a one-row aggregate. */
  def connectedComponentsStar(edges: DataFrame): DataFrame = {
    // (row count, XOR of 64-bit edge hashes): order-free and overflow-free
    // under ANSI mode; equal sets always tie, unequal sets of equal size
    // tie with probability ~2^-64 (edge frames are distinct, so no
    // duplicate-cancellation concern).
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("hi"), col("lo")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var e = edges.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct().localCheckpoint(true)
    var eFp = fingerprint(e)
    var changed = eFp._1 > 0
    while (changed) {
      // large-star over the symmetrized neighborhood: emit (v, m(u)) for
      // every neighbor v strictly above u; v > u ≥ m keeps hi/lo canonical
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val minsL = sym.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      // no hi =!= lo filter needed: v > u ≥ m by construction, so the
      // emitted edge can never be a self-loop
      val large = sym.join(minsL, "u").where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct().localCheckpoint(true)
      // small-star on the lo-pointing edges: u's smaller neighborhood
      // (all lo's, plus u itself) re-attaches to its minimum
      val minsS = large.groupBy("hi").agg(least(col("hi"), min(col("lo"))).as("m"))
      val small = large.join(minsS, "hi")
        .select(col("lo").as("n"), col("m"))
        .unionByName(minsS.select(col("hi").as("n"), col("m")))
        .where(col("n") =!= col("m"))
        .select(col("n").as("hi"), col("m").as("lo"))
        .distinct().localCheckpoint(true)
      val nextFp = fingerprint(small)
      changed = nextFp != eFp || small.except(e).count() > 0
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"CC-star round edges=${nextFp._1}")
      e = small
      eFp = nextFp
    }
    // fixpoint = union of stars: hi points at its component min; centers
    // label themselves
    e.select(col("hi").as("node"), col("lo").as("label"))
      .unionByName(e.select(col("lo").as("node"), col("lo").as("label")))
      .distinct()
  }

  /** [[nsChecked]]'s twin for the oracle SQL: out-of-range input must
    * fail in BOTH engines (crash-vs-silent-fuse divergence otherwise). */
  private def nsCheckedSql(e: String, what: String): String =
    s"CASE WHEN ($e) < 0 OR ($e) >= $Uk1Offset THEN CAST(error(" +
      s"'$what outside the [0, 2^61) node namespace: ' || ($e)) AS BIGINT) " +
      s"ELSE ($e) END"

  def conflictGroupsSql: String =
    s"""WITH RECURSIVE c AS (${Cdc.changesCte}),
       |lagged AS (
       |  SELECT commit_ts, pk, op, event_type, value,
       |    CAST(props->>'$$.k' AS BIGINT) AS k,
       |    lag(value) OVER w AS prev_value,
       |    lag(event_type) OVER w AS prev_type,
       |    lag(CAST(props->>'$$.k' AS BIGINT)) OVER w AS prev_k
       |  FROM c
       |  WINDOW w AS (PARTITION BY pk ORDER BY commit_ts)),
       |keys AS (
       |  SELECT commit_ts, pk,
       |    CASE WHEN value > 300.0
       |         THEN ${nsCheckedSql("k", "uk1 key")} + $Uk1Offset END AS uk1_new,
       |    CASE WHEN event_type = 'purchase'
       |         THEN ${nsCheckedSql("CAST(floor(value) AS BIGINT)", "uk2 key")}
       |              + $Uk2Offset END AS uk2_new,
       |    CASE WHEN op = 'U' AND prev_value > 300.0
       |         THEN ${nsCheckedSql("prev_k", "uk1 key")} + $Uk1Offset END AS uk1_old,
       |    CASE WHEN op = 'U' AND prev_type = 'purchase'
       |         THEN ${nsCheckedSql("CAST(floor(prev_value) AS BIGINT)", "uk2 key")}
       |              + $Uk2Offset END AS uk2_old
       |  FROM lagged),
       |half AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT ${nsCheckedSql("pk", "pk node")} AS src, uk1_new AS dst
       |    FROM keys WHERE uk1_new IS NOT NULL
       |    UNION ALL SELECT ${nsCheckedSql("pk", "pk node")}, uk2_new
       |    FROM keys WHERE uk2_new IS NOT NULL
       |    UNION ALL SELECT ${nsCheckedSql("pk", "pk node")}, uk1_old
       |    FROM keys WHERE uk1_old IS NOT NULL
       |    UNION ALL SELECT ${nsCheckedSql("pk", "pk node")}, uk2_old
       |    FROM keys WHERE uk2_old IS NOT NULL)),
       |edges AS (
       |  SELECT src, dst FROM half
       |  UNION ALL SELECT dst, src FROM half),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach(node, label) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node),
       |labels AS (SELECT node, min(label) AS label FROM reach GROUP BY node)
       |SELECT k.commit_ts, k.pk, coalesce(l.label, k.pk) AS group_id
       |FROM keys k LEFT JOIN labels l ON k.pk = l.node""".stripMargin
}
