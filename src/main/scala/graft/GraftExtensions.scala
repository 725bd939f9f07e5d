package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftx._
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft expression library.
  *
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) makes
  * every custom Catalyst expression/aggregate callable from `spark.sql`:
  *
  * {{{
  *   SELECT graft_dot_product(emb, query)            -- codegen'd scalar
  *   SELECT graft_shingles(text, 3)                  -- distinct n-grams
  *   SELECT graft_intersect_size(a, b)               -- |A ∩ B| without the array
  *   SELECT graft_kmv_distinct(tok, 64)  GROUP BY …  -- KMV cardinality sketch
  *   SELECT graft_simhash(tok)           GROUP BY …  -- packed 64-bit simhash
  *   SELECT graft_minhash_sigs(sh, 8)    GROUP BY …  -- K–M minhash signature
  *   SELECT graft_topk_pairs(key, id, 50) GROUP BY … -- bounded-heap top-k
  * }}}
  *
  * The builders return the raw expression (aggregates unwrapped — the
  * analyzer adds the AggregateExpression, exactly as for built-ins), so
  * SQL and Column-API calls produce byte-identical plans. Size/count
  * parameters must be integer literals: they shape aggregation-buffer
  * layouts, which cannot vary per row.
  *
  * [[GraftExtensions.register]] adds the same functions to an EXISTING
  * session (session-scoped registry, not global), for sessions the caller
  * cannot rebuild with extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal (it sizes the aggregation buffer), " +
        s"got $other")
  }

  private def desc(name: String, clazz: Class[_], usage: String)(
      builder: PartialFunction[Seq[Expression], Expression]): Description = {
    val checked: Seq[Expression] => Expression = args =>
      builder.applyOrElse(args, (as: Seq[Expression]) =>
        throw new IllegalArgumentException(
          s"$name: wrong number of arguments (${as.length}); usage: $usage"))
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, ""),
      checked)
  }

  /** One entry per graftx expression with a SQL-expressible signature
    * ([[NearestCentroid]] carries driver-resident centroid arrays, so it
    * stays Column-API-only).
    */
  val descriptions: Seq[Description] = Seq(
    desc("graft_dot_product", classOf[DotProduct],
         "graft_dot_product(array<double>, array<double>)") {
      case Seq(a, b) => DotProduct(a, b)
    },
    desc("graft_intersect_size", classOf[IntersectSize],
         "graft_intersect_size(array<string>, array<string>)") {
      case Seq(a, b) => IntersectSize(a, b)
    },
    desc("graft_shingles", classOf[ShingleArray],
         "graft_shingles(text, n)") {
      case Seq(t, n) => ShingleArray(t, intLit(n, "graft_shingles", "n"))
    },
    desc("graft_kmv_distinct", classOf[KmvDistinct],
         "graft_kmv_distinct(value, k)") {
      case Seq(v, k) => KmvDistinct(v, intLit(k, "graft_kmv_distinct", "k"))
    },
    desc("graft_simhash", classOf[SimhashAgg], "graft_simhash(feature)") {
      case Seq(v) => SimhashAgg(v)
    },
    desc("graft_minhash_sigs", classOf[MinHashSigs],
         "graft_minhash_sigs(shingle, num_hashes)") {
      case Seq(v, k) =>
        MinHashSigs(v, intLit(k, "graft_minhash_sigs", "num_hashes"))
    },
    desc("graft_topk_pairs", classOf[TopKPairs],
         "graft_topk_pairs(key, id, k)") {
      case Seq(key, id, k) =>
        TopKPairs(key, id, intLit(k, "graft_topk_pairs", "k"))
    },
    desc("graft_char_grams", classOf[CharGramArray],
         "graft_char_grams(text, k)") {
      case Seq(t, k) => CharGramArray(t, intLit(k, "graft_char_grams", "k"))
    },
    desc("graft_char_hist", classOf[CharHistogram],
         "graft_char_hist(text) — (ch, c) per distinct code point") {
      case Seq(t) => CharHistogram(t)
    },
    desc("graft_char_gram_hist", classOf[CharGramHistogram],
         "graft_char_gram_hist(text, k) — (g, c) per distinct char k-gram") {
      case Seq(t, k) =>
        CharGramHistogram(t, intLit(k, "graft_char_gram_hist", "k"))
    },
    desc("graft_cdc_chunks", classOf[CdcChunkArray],
         "graft_cdc_chunks(text, k, divisor) — content-defined chunks") {
      case Seq(t, k, d) => CdcChunkArray(t,
        intLit(k, "graft_cdc_chunks", "k"),
        intLit(d, "graft_cdc_chunks", "divisor"))
    },
    // descending=true fixed: SQL callers get the top-k-by-value-DESC key
    // (the TopKPairs companion); MomentTerms-style asc variants can be
    // added if a consumer appears
    desc("graft_double_sort_key", classOf[DoubleSortKey],
         "graft_double_sort_key(double) — 16-hex key, ASC order = value DESC") {
      case Seq(v) => DoubleSortKey(v, descending = true)
    },
    desc("graft_double_sort_key_decode", classOf[DoubleSortKeyDecode],
         "graft_double_sort_key_decode(key) — exact inverse") {
      case Seq(k) => DoubleSortKeyDecode(k, descending = true)
    })

  /** Post-hoc registration on an existing session (same builders the
    * extension injects; registry is session-scoped).
    */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, b) =>
      Bridge.registerFunction(spark, id, info, b)
    }
}
