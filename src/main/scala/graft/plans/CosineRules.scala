package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** Optimizer rule (SURVEY §4.2.4): `cosine_sim(x, x)` ≡ 1.0 for any
  * non-degenerate vector — fold it before execution so self-join
  * similarity matrices skip the 2·d-multiply loop on the diagonal.
  *
  * Deliberately conservative: only fires on semantically-equal children
  * (Catalyst canonicalization), the one case with no numeric caveat
  * beyond the zero-vector (which the data model excludes for unit/feature
  * embeddings, and which brute evaluation would return NaN for anyway —
  * documented behavior change we accept, as the reference sketches do).
  */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.canonicalized == b.canonicalized &&
          a.deterministic =>
        Literal(1.0, DoubleType)
    }
}
