package graft

import graft.functions.{DictSegment, DotProduct, MinHashSignature, ShingleHashes, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions wiring graft's native expressions into any
  * session at build time — the deployment-grade alternative to the
  * per-operator `Vectors.ensureRegistered` fallback:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)         // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions (config/submit)
  *
  * After registration the functions are usable from SQL too:
  * `SELECT graft_dot(a.v, b.v) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_sig"),
      exprs => MinHashSignature(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      exprs => ShingleHashes(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      exprs => SimHash64(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[graft.functions.RepStats].getName,
        "graft_rep_stats"),
      exprs => graft.functions.RepStats(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_dict_segment"),
      new ExpressionInfo(classOf[DictSegment].getName, "graft_dict_segment"),
      exprs => DictSegment(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName,
        "graft_pq_encode"),
      exprs => graft.functions.PqEncode(exprs(0), exprs(1), exprs(2),
        exprs(3))))
    e.injectFunction((
      new FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[graft.functions.PqLut].getName,
        "graft_pq_lut"),
      exprs => graft.functions.PqLut(exprs(0), exprs(1), exprs(2),
        exprs(3))))
    e.injectFunction((
      new FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName,
        "graft_pq_adc"),
      exprs => graft.functions.PqAdc(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[graft.functions.WinnowFps].getName,
        "graft_winnow_fps"),
      exprs => graft.functions.WinnowFps(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      exprs => graft.functions.SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_gt"),
      new ExpressionInfo(
        classOf[graft.functions.SortedIntersectGreater].getName,
        "graft_sorted_intersect_gt"),
      exprs => graft.functions.SortedIntersectGreater(exprs(0), exprs(1),
        exprs(2))))
    e.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName,
        "graft_kmv"),
      exprs => graft.functions.KmvSketchAgg(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_distinct"),
      new ExpressionInfo(classOf[graft.functions.BitmapDistinctAgg].getName,
        "graft_bitmap_distinct"),
      exprs => graft.functions.BitmapDistinctAgg(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_bytes"),
      new ExpressionInfo(classOf[graft.functions.BitmapBytesAgg].getName,
        "graft_bitmap_bytes"),
      exprs => graft.functions.BitmapBytesAgg(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_or_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapOrCount].getName,
        "graft_bitmap_or_count"),
      exprs => graft.functions.BitmapOrCount(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_union"),
      new ExpressionInfo(classOf[graft.functions.BitmapUnionAgg].getName,
        "graft_bitmap_union"),
      exprs => graft.functions.BitmapUnionAgg(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_card"),
      new ExpressionInfo(classOf[graft.functions.BitmapCardinality].getName,
        "graft_bitmap_card"),
      exprs => graft.functions.BitmapCardinality(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapAndCount].getName,
        "graft_bitmap_and_count"),
      exprs => graft.functions.BitmapAndCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_bitmap_andnot_count"),
      new ExpressionInfo(classOf[graft.functions.BitmapAndNotCount].getName,
        "graft_bitmap_andnot_count"),
      exprs => graft.functions.BitmapAndNotCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[graft.functions.CmsEstimate].getName,
        "graft_cms_estimate"),
      exprs => graft.functions.CmsEstimate(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_bloom_any"),
      new ExpressionInfo(classOf[graft.functions.BloomAnyContain].getName,
        "graft_bloom_any"),
      exprs => graft.functions.BloomAnyContain(exprs(0), exprs(1))))
    // whole-operator extension: the native as-of join strategy, so a
    // config-only session (spark.sql.extensions=graft.GraftExtensions)
    // plans graft.plans.AsOfJoinNode without any runtime registration
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
    // ...and the matching optimizer rules (left-predicate pushdown
    // through the custom nodes)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughIntervalJoin)
    // materialized-view rewrite: queries matching the registered
    // canonical aggregate are spliced onto the precomputed summary
    e.injectOptimizerRule(session => graft.plans.SummaryRewrite(session))
    // declared dense-id columns serve COUNT(DISTINCT) through the
    // native bitmap aggregate — plan changes, answer provably doesn't
    e.injectOptimizerRule(session => graft.plans.BitmapCountRewrite(session))
    // raw-SQL surface for the custom joins:
    //   SELECT * FROM graft_asof_join('l', 'r', 'key', 'ts', 'val')
    // the TVF parses to an unresolved marker; the resolution rule
    // swaps in AsOfJoinNode/IntervalJoinNode once the sides resolve
    e.injectTableFunction((graft.plans.AsOfSql.asOfIdent,
      graft.plans.AsOfSql.asOfInfo,
      exprs => graft.plans.AsOfSql.asOfBuilder(exprs)))
    e.injectTableFunction((graft.plans.AsOfSql.intervalIdent,
      graft.plans.AsOfSql.intervalInfo,
      exprs => graft.plans.AsOfSql.intervalBuilder(exprs)))
    e.injectTableFunction((graft.plans.AsOfSql.temporalIdent,
      graft.plans.AsOfSql.temporalInfo,
      exprs => graft.plans.AsOfSql.temporalBuilder(exprs)))
    e.injectResolutionRule(_ => graft.plans.AsOfSql.ResolveGraftJoins)
    e.injectResolutionRule(session =>
      graft.plans.AsOfSql.ResolveTemporalJoin(session))
  }
}
