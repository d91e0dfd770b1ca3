package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning: drop big-side rows that cannot match
  * BEFORE the join's shuffle.
  *
  * At cluster scale the dominant cost of `big ⋈ small` with a selective
  * small side is shuffling the big side: every big row is hashed, spilled,
  * and fetched even when only a sliver survives the join. Building a Bloom
  * filter over the small side's keys (one distributed aggregate producing a
  * few hundred KB) and testing big rows against it inside the SCAN stage
  * turns the shuffle volume from |big| into ~|matching| + ε. This is the
  * manual form of Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on in
  * [[graft.GraftSession]]) for the cases the optimizer won't inject:
  * selectivity it can't estimate, a small side behind a non-reporting
  * source, or a reusable filter applied to several big tables.
  *
  * Exactness: the Bloom test only PRUNES — every surviving row still goes
  * through the real equi-join, so false positives cost a little shuffle,
  * never wrong rows. That also restricts the supported join types to those
  * where dropping a provably-unmatched big row is invisible: `inner` and
  * `left_semi` (big on the left). A `left_outer`/`left_anti` big side must
  * keep its unmatched rows, which is exactly what the filter removes.
  */
object BloomJoin {

  /** `mightContain` as a native expression over a pre-hashed long key.
    * The serialized filter rides the closure once per executor
    * (deserialized lazily, shared across the task's rows); one virtual
    * call per row, same [[graft.functions.VectorHash]] trade.
    */
  private[graft] case class BloomMightContainExpr(
      child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def inputTypes = Seq(LongType) // inferred type: AbstractDataType is private[sql]
    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))
    override protected def nullSafeEval(value: Any): Any =
      filter.mightContainLong(value.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain"
  }

  /** Composite key → one long: null-safe xxhash64 over the key columns.
    * Both the build and probe sides use the same hash, so equal keys always
    * collide into the same filter bit positions.
    */
  private def keyHash(keys: Seq[String]): Column = xxhash64(keys.map(col): _*)

  /** Build a Bloom filter over `small`'s composite key.
    *
    * `expectedItems` sizes the filter (bits ≈ -n·ln(fpp)/ln2²); the default
    * 1M at 3% fpp is ~900 KB serialized — cheap to ship in a task closure.
    * Undersizing degrades fpp (more shuffle, still correct), never
    * correctness. The build is a distributed treeAggregate over `small`
    * (`stat.bloomFilter`); only the merged filter lands on the driver.
    */
  def buildKeyFilter(
      small: DataFrame, keys: Seq[String],
      expectedItems: Long = 1000000L, fpp: Double = 0.03): Array[Byte] = {
    require(keys.nonEmpty)
    val bf = small.stat.bloomFilter(keyHash(keys), expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership-test column for a composite key against a built filter —
    * for callers that need the complement or a flag column rather than the
    * pruned frame (e.g. [[Dedup.dropSeenDocumentsBloom]]).
    */
  def mightContainColumn(keys: Seq[String], filterBytes: Array[Byte]): Column =
    Bridge.column(BloomMightContainExpr(Bridge.expression(keyHash(keys)), filterBytes))

  /** Filter `df` to rows whose composite key might be in `filterBytes`. */
  def pruneByFilter(df: DataFrame, keys: Seq[String], filterBytes: Array[Byte]): DataFrame =
    df.filter(mightContainColumn(keys, filterBytes))

  /** `big ⋈ small` on `keys`, with the big side Bloom-pruned first.
    *
    * Result is EXACTLY `big.join(small, keys, joinType)` — the filter is a
    * pre-shuffle reduction, not an approximation (oracle-gated as
    * `j12_bloom_join`).
    */
  def bloomPrunedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      joinType: String = "inner",
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "semi").contains(jt),
      s"bloomPrunedJoin supports inner/left_semi only (got $joinType): other " +
        "types must keep unmatched big-side rows, which pruning removes")
    val pruned = pruneByFilter(big, keys, buildKeyFilter(small, keys, expectedItems, fpp))
    pruned.join(small, keys, joinType)
  }
}
