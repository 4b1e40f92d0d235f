package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for great-circle (haversine) distance in
  * km — the geodesic kernel of the reference's track descriptors
  * (`/root/reference/R/preprocess-pds-trips.R:127-131`).
  *
  * A Scala UDF would force argument boxing and break whole-stage
  * codegen; this expression generates a single static call inside the
  * produced Java, so the surrounding Project/Filter stays in one
  * codegen stage. Registered as SQL function `haversine_km` (via
  * [[GraftExtensions]] or [[HaversineKm.register]]).
  */
case class HaversineKm(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  // AbstractDataType (and with it ImplicitCastInputTypes) is
  // private[sql], so input typing is checked manually; the SQL builder
  // inserts casts for numeric arguments.
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(lat1: Any, lng1: Any, lat2: Any, lng2: Any): Any =
    HaversineKm.compute(
      lat1.asInstanceOf[Double], lng1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lng2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.HaversineKm.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineKm =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object HaversineKm {
  /** IEEE-deterministic given identical inputs; mirrors
    * [[Geo.haversineKm]]'s arithmetic exactly. */
  def compute(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2.0
    val dLng = math.toRadians(lng2 - lng1) / 2.0
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLng) * math.sin(dLng)
    2.0 * Geo.EarthRadiusKm * math.asin(math.sqrt(a))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HaversineKm].getName, "haversine_km")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4, "haversine_km(lat1, lng1, lat2, lng2)")
    val cast = exprs.map(e =>
      if (e.dataType == DoubleType) e else Cast(e, DoubleType))
    HaversineKm(cast(0), cast(1), cast(2), cast(3))
  }

  /** Session-local registration (tests, ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_km", builder, "built-in")
}

/** Engine extensions: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) installs the
  * engine's native functions into every session derived from the
  * builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("haversine_km"),
      HaversineKm.info, HaversineKm.builder))
    e.injectFunction((FunctionIdentifier("mean_digit_runs"),
      MeanDigitRuns.info, MeanDigitRuns.builder))
    e.injectFunction((FunctionIdentifier("point_in_ring"),
      PointInRing.info, PointInRing.builder))
    e.injectFunction((FunctionIdentifier("top_k_min"),
      TopKMin.info, TopKMin.builder))
    e.injectFunction((FunctionIdentifier("unicode_nfc"),
      NfcNormalize.info, NfcNormalize.builder))
    e.injectFunction((FunctionIdentifier("dot_scaled"),
      DotScaled.info, DotScaled.builder))
    e.injectFunction((FunctionIdentifier("word_ngrams"),
      graft.text.WordNgrams.info, graft.text.WordNgrams.builder))
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      JaroWinkler.info, JaroWinkler.builder))
    e.injectFunction((FunctionIdentifier("common_prefix_len"),
      CommonPrefixLen.info, CommonPrefixLen.builder))
    // derive pushable bounding-box conjuncts from point_in_ring filters
    e.injectOptimizerRule(_ => graft.plans.PointInRingBBox)
    // rewrite filter(row_number <= k) into the heap-based top-k operator
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
