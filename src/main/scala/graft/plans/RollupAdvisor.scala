package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias,
  AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Workload-driven rollup RECOMMENDATION — the "aggregate advisor"
  * half every cube server ships beside its navigator: given the
  * queries a site actually runs (as DataFrames — the same objects the
  * user already has), extract each aggregate's (base table, grouping
  * dims, measures), then propose the MAXIMAL grains: a dim-set is
  * absorbed by any proposed superset, because [[RollupRewrite]]'s
  * lattice descent answers subset groupings from the superset summary
  * (grouping by fewer dims re-partitions whole cells). The output is
  * the register()/[[RollupBuild.materialize]] worklist, one row per
  * recommended summary, with the two numbers that decide whether to
  * build it: exact cell count at the grain and the base row count
  * (their ratio is the scan-bytes compression every covered dashboard
  * query gets).
  *
  * Deliberately mechanical, not cost-based: cell counting is exact
  * (one small distinct-count per proposal, an offline advisor job),
  * coverage is syntactic subset-ness of dim sets, and expressions are
  * compared by canonical SQL rendering after resolving through
  * Project aliases — the same name-free matching discipline the
  * rewrite itself uses, so a proposal the advisor emits is a grain
  * the navigator will actually hit. Filters are ignored for
  * extraction (a dim-only filter doesn't change the useful grain;
  * a measure filter makes the query unanswerable from ANY summary,
  * which is a per-query property, not a grain property). */
object RollupAdvisor {

  final case class Candidate(basePath: String, dims: Seq[String],
      measures: Seq[String])

  final case class Proposal(basePath: String, dims: Seq[String],
      measures: Seq[String], queriesCovered: Int)

  private def stripToRelation(p: LogicalPlan,
      subst: Map[ExprId, Expression])
      : Option[(String, Map[ExprId, Expression])] = p match {
    case Project(pl, child) if pl.forall(_.deterministic) =>
      stripToRelation(child, subst ++ pl.collect {
        case a: Alias => a.exprId -> a.child
      })
    case SubqueryAlias(_, child) => stripToRelation(child, subst)
    case Filter(_, child) => stripToRelation(child, subst)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths
        if (roots.isEmpty) None
        else Some((roots.map(_.toString).sorted.mkString(";"), subst))
      case _ => None
    }
    case _ => None
  }

  private def resolve(e: Expression,
      subst: Map[ExprId, Expression]): Expression = {
    var cur = e
    var fuel = 20
    var changed = true
    while (changed && fuel > 0) {
      changed = false
      cur = cur.transformUp {
        case a: AttributeReference if subst.contains(a.exprId) =>
          changed = true; subst(a.exprId)
      }
      fuel -= 1
    }
    cur
  }

  /** One Candidate per aggregate-over-file-scan in the workload's
    * ANALYZED plans (top-most aggregate per query; nested aggregates
    * over derived frames are not summary candidates). */
  def candidates(workload: Seq[DataFrame]): Seq[Candidate] =
    workload.flatMap { df =>
      df.queryExecution.analyzed.collectFirst {
        case agg: Aggregate => agg
      }.flatMap { agg =>
        stripToRelation(agg.child, Map.empty).map { case (path, subst) =>
          val dims = agg.groupingExpressions
            .map(g => resolve(g, subst).sql).distinct.sorted
          val measures = agg.aggregateExpressions.flatMap(_.collect {
            case ae: AggregateExpression => ae
          }).flatMap(_.aggregateFunction.children)
            .filterNot(_.foldable)
            .map(c => resolve(c, subst).sql).distinct.sorted
          Candidate(path, dims, measures)
        }
      }
    }

  /** The recommended build list: per base, the maximal dim-sets with
    * their coverage counts and the union of measures of the queries
    * they absorb. */
  def propose(workload: Seq[DataFrame]): Seq[Proposal] = {
    val cands = candidates(workload)
    cands.groupBy(_.basePath).toSeq.flatMap { case (path, cs) =>
      val dimSets = cs.map(_.dims.toSet).distinct
      val maximal = dimSets.filterNot(s =>
        dimSets.exists(t => s != t && s.subsetOf(t)))
      maximal.map { s =>
        val covered = cs.filter(_.dims.toSet.subsetOf(s))
        Proposal(path, s.toSeq.sorted,
          covered.flatMap(_.measures).distinct.sorted, covered.size)
      }
    }.sortBy(p => (p.basePath, p.dims.mkString(",")))
  }
}
