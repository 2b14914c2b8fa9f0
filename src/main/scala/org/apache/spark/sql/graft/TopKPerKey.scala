package org.apache.spark.sql.graft

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key with MAP-SIDE PARTIAL PRUNING — the whole-operator
  * extension tier: a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * registered through `SparkSessionExtensions` (see
  * [[graft.functions.GraftSql.injectInto]]).
  *
  * Honest positioning: since 3.5 Spark's own `WindowGroupLimit` rewrite
  * gives the `row_number() OVER (...) <= k` pattern the SAME map-side
  * prune (the shuffle-records parity is pinned in `TopKPerKeySpec`).
  * What this operator adds is (a) the reference implementation of the
  * full extension-tier stack — logical node, strategy, exec, and the
  * opt-in optimizer rewrite — on a semantics simple enough to oracle
  * exactly; (b) a direct API needing no window machinery; and (c) no
  * post-shuffle per-group SortExec: the final pass merges bounded
  * buffers instead of sorting each group's surviving `k × maps` rows.
  * Both plans keep the shuffle at `k × keys-per-partition` rows instead
  * of everything — the property the spec pins so neither can regress.
  *
  * Semantics: the k smallest rows per key group under `sortOrder` (pass a
  * descending order for "top by largest"); `sortOrder` should be a TOTAL
  * order (include a tiebreak) for deterministic output. Rows are emitted
  * unchanged (`output = child.output`). Executor memory per task is
  * bounded by `k × distinct keys in the partition` — the operator targets
  * small k (ranking shortlists), not large-k selection. */
case class TopKPerKeyPlan(keyExprs: Seq[Expression],
                          sortOrder: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k >= 1")
  // grouping relies on byte-wise UnsafeRow equality (after float
  // normalization); reject key types where binary equality differs from
  // semantic equality — the same orderability check CheckAnalysis applies
  // to grouping keys (map types in particular would silently split groups)
  keyExprs.filter(_.resolved).foreach { e =>
    require(RowOrdering.isOrderable(e.dataType),
      s"key type ${e.dataType.catalogString} cannot be used as a " +
        "TopKPerKey grouping key: not an orderable/groupable data type")
  }
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
    : TopKPerKeyPlan = copy(child = newChild)
}

/** Physical operator: partial per-partition top-k → hash shuffle on the
  * key → final per-key merge. The shuffle carries (key, row) pairs with
  * `UnsafeRow` keys (byte-wise hashCode/equals, stable across tasks). */
case class TopKPerKeyExec(keyExprs: Seq[Expression],
                          sortOrder: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: SparkPlan)
    : TopKPerKeyExec = copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    // group by NORMALIZED key bytes: floating-point keys must collapse
    // 0.0/-0.0 and all NaN bit patterns into one group, exactly as
    // Catalyst normalizes window/aggregate grouping keys — without this,
    // byte-wise UnsafeRow equality would split such keys into separate
    // groups and emit up to 2k rows per logical key
    val keys = keyExprs.map(
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
        .normalize)
    val order = sortOrder
    val kk = k
    // bounded insertion into a sorted buffer: O(k) per row, fine for the
    // small-k shortlist regime this operator targets
    def topKPartition(it: Iterator[InternalRow])
      : Iterator[(UnsafeRow, UnsafeRow)] = {
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val rowProj = UnsafeProjection.create(
        childOutput.map(_.asInstanceOf[Expression]), childOutput)
      val ord = RowOrdering.create(order, childOutput)
      val m = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var buf = m.get(key)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[UnsafeRow](kk + 1)
          m.put(key.copy(), buf)
        }
        if (buf.length < kk || ord.lt(row, buf.last)) {
          val copy = rowProj(row).copy()
          val at = buf.indexWhere(b => ord.lt(copy, b))
          if (at < 0) buf.append(copy) else buf.insert(at, copy)
          if (buf.length > kk) buf.remove(kk)
        }
      }
      val entries = m.entrySet().iterator()
      new Iterator[(UnsafeRow, UnsafeRow)] {
        private var cur: Iterator[(UnsafeRow, UnsafeRow)] = Iterator.empty
        def hasNext: Boolean = cur.hasNext || {
          while (!cur.hasNext && entries.hasNext) {
            val e = entries.next()
            cur = e.getValue.iterator.map(r => (e.getKey, r))
          }
          cur.hasNext
        }
        def next(): (UnsafeRow, UnsafeRow) = { hasNext; cur.next() }
      }
    }
    val numParts = math.max(1,
      conf.getConf(org.apache.spark.sql.internal.SQLConf.SHUFFLE_PARTITIONS))
    child.execute()
      .mapPartitions(topKPartition) // partial: ≤ k rows per key per task
      .partitionBy(new HashPartitioner(numParts))
      .mapPartitions { it => // final: merge the partials per key
        topKPartition(it.map(_._2)).map(_._2.asInstanceOf[InternalRow])
      }
  }
}

/** Planner strategy mapping the logical node to its exec — injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** OPT-IN optimizer rule (`spark.graft.topkRewrite.enabled`, default
  * false): rewrites the canonical shortlist pattern
  * `withColumn(rn, row_number over (partition key order o)).where(rn <=
  * k).drop(rn)` into [[TopKPerKeyPlan]] — the rank window's
  * shuffle-everything plan becomes the map-side-partial operator with no
  * query change. Injected via `injectOptimizerRule`.
  *
  * Opt-in because the engine cannot prove the window order total: under
  * ties BOTH formulations return an arbitrary valid shortlist, but not
  * necessarily the SAME one — a caller relying on a partial order's
  * incidental tie choice would see different (equally valid) rows. */
object TopKWindowRewrite
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}
  import org.apache.spark.sql.types.IntegerType

  private def kOf(cond: Expression,
                  rn: AttributeSet): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if rn.contains(a) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if rn.contains(a) => Some(k - 1)
    // commuted forms: `k >= rn` ≡ `rn <= k`, `k > rn` ≡ `rn < k`
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if rn.contains(a) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if rn.contains(a) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topkRewrite.enabled", "false")
        .toBoolean) plan
    else {
      // TopKPerKeyExec buffers k rows per distinct key in heap with no
      // spill (WindowExec's sort spills); cap the k this rule will
      // rewrite so enabling the flag can't hand a large-k shortlist —
      // whose window plan survived on spill — to the in-memory operator
      val maxK = conf
        .getConfString("spark.graft.topkRewrite.maxK", "100").toInt
      plan.transformUp {
        case p @ Project(projList, Filter(cond,
            w @ Window(Seq(Alias(WindowExpression(_: RowNumber, _), _)),
              part, order, child, _)))
          if projList.forall(_.isInstanceOf[Attribute]) &&
            AttributeSet(projList).subsetOf(child.outputSet) &&
            part.nonEmpty =>
          kOf(cond, w.windowOutputSet) match {
            case Some(k) if k >= 1 && k <= maxK =>
              Project(projList, TopKPerKeyPlan(part, order, k, child))
            case _ => p
          }
      }
    }
}

/** DataFrame-level builder: resolves key/order columns by name against the
  * analyzed child so the custom node enters the analyzer fully resolved. */
object TopKPerKeyOps {
  /** `orderCols` as (name, ascending); k smallest under that order per
    * distinct `keyCols` tuple. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val analyzed = df.queryExecution.analyzed
    // honor the session's case-sensitivity setting, like every other
    // by-name resolution in the DataFrame API
    val resolver = spark.sessionState.conf.resolver
    def attr(name: String): Attribute =
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    classic.Dataset.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), order, k, analyzed))
  }
}
