package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window, WindowGroupLimit}

/** The registry-wide window-cardinality gate (PlanSpec applies it to every
  * registered query; EdgeSpec proves it rejects the defect class).
  *
  * The defect class: a Window partitioned on a low-cardinality key (or
  * none) whose input grows with the data is a single-task sort of 1/k of
  * the table at 100 TB. A window is accepted iff one of:
  *  (a) it partitions on a documented high-cardinality / bounded-per-key
  *      column (per-entity ids; ScalableRank's constructed bucket keys);
  *  (b) a WindowGroupLimit covers its partition keys (rank-filter pushdown
  *      caps per-partition work map-side);
  *  (c) its input is an Aggregate whose grouping keys are ALL in the
  *      bounded-domain allowlist below — the window then runs over a
  *      group table whose cardinality is fixed by the key domains, not by
  *      the data volume (the ScalableRank prefix-sum-over-bucket-counts
  *      shape, the q104 value-count pattern).
  *
  * Round-13 hardening (round-12 verdict #2): (c) used to accept ANY
  * aggregate input. That was sound for every registered query (all
  * aggregate-fed windows sit over domain-bounded keys — verified by
  * probe), but it could not prove it for future additions: an aggregate
  * keyed on user_id feeding a global window is exactly as unbounded as
  * the raw table at 100 TB (one row per user). Now the aggregate's keys
  * must themselves be declared bounded. EdgeSpec pins the rejection.
  */
object WindowCardGate {
  /** Per-entity ids whose cardinality grows with the data (fine to
    * PARTITION on — many small partitions), plus range-bucket keys whose
    * cardinality is chosen so per-bucket rows are bounded by construction
    * (ops/ScalableRank). */
  val highCard: Set[String] = Set(
    "user_id", "doc_id", "probe_id", "vec_id", "cand_id", "chunk_id",
    "o_orderkey", "l_orderkey", "o_custkey", "c_custkey", "event_id",
    "content_key", "nkey", "sig", "session_id",
    "__bucket", "__pid", "bucket", "band", "cell")

  /** Aggregate grouping keys whose DOMAIN bounds the group count
    * independently of data volume, so a window over the aggregate output
    * is a bounded computation at any scale. Name-based (the same
    * approximation the highCard set makes — keep real column names
    * through the window, see the verify skill note). Categories:
    *  - TPC-H categorical enums: 3 order statuses, 3 return flags,
    *    5 priorities, fixed event/source/lang/model label sets;
    *  - calendar keys: days/weeks since epoch grow at ~365/year, not
    *    with row count (t, di, cw; Catalyst aliases computed
    *    date_trunc/year-month keys `_groupingexpression`);
    *  - quantized value domains — the q104 value-count pattern groups by
    *    the VALUE of an integer-quantized measure (quantities 1..50,
    *    cents, token counts, bucketed scores), so |groups| ≤ |domain|;
    *  - vocab keys: closed token/bigram spaces (token, bg);
    *  - constant grids: bootstrap replicas, sketch rows, histogram bins,
    *    median-of-means buckets (b, r, g, lb, w, nk);
    *  - ScalableRank's __pid bucket key (bounded by bucket count). */
  val boundedDomain: Set[String] = Set(
    // categorical enums (incl. the 25-nation / 5-region TPC-H key space)
    "o_orderstatus", "l_returnflag", "l_linestatus", "o_orderpriority",
    "l_shipmode", "source", "lang", "flag", "model", "event_type",
    "is_boot", "n_name", "r_name", "c_nationkey", "s_nationkey",
    "n_nationkey", "n_regionkey", "c_mktsegment",
    // calendar
    "t", "di", "cw", "day", "week", "month", "_groupingexpression",
    // quantized value domains (value-count pattern)
    "l_quantity", "v", "x", "y", "nt", "score", "lb", "w", "nk",
    // vocab
    "token", "bg",
    // constant grids / buckets
    "g", "b", "r", "__pid", "__bucket")

  /** All gate violations in `plan`; empty = accepted. */
  def violations(plan: LogicalPlan): Seq[String] = {
    val limits = plan.collect {
      case g: WindowGroupLimit =>
        g.partitionSpec.flatMap(_.references.map(_.name)).toSet
    }
    plan.collect { case w: Window => w }.flatMap { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      // Topmost aggregate below the window: the table the window
      // actually runs over (collect is pre-order, head = shallowest).
      val topAggKeys = w.child.collect { case a: Aggregate => a }
        .headOption.map(_.groupingExpressions
          .flatMap(_.references.map(_.name)).toSet)
      // A limit matches on exact key-set equality (covers the GLOBAL
      // top-k case: empty spec == empty keys) or on a nonempty subset;
      // a bare empty-spec limit must not bless unrelated partitioned
      // windows via the vacuous subset. Catalyst's own static row
      // bound also accepts: a global rank filter pushes a plain
      // GlobalLimit below the window (LimitPushDownThroughWindow), not
      // a WindowGroupLimit, and maxRows carries that proof.
      val ok = keys.exists(highCard) ||
        limits.exists(l => l == keys || (l.subsetOf(keys) && l.nonEmpty)) ||
        w.child.maxRows.exists(_ <= 100000L) ||
        // keys=[] is a global aggregate: 1 row, trivially bounded
        topAggKeys.exists(_.forall(boundedDomain))
      if (ok) None
      else Some(s"window partitioned on $keys over " +
        topAggKeys.fold("a raw (un-aggregated) input")(ks =>
          s"an aggregate keyed on unbounded $ks"))
    }
  }
}
