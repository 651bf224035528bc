package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Session-scoped order-preserving string dictionaries — the structure
  * behind the reference's per-column StringDictionary
  * (`StringDictionary/StringDictionary.cpp` in /root/reference): dense ids
  * in [0, D) whose numeric order IS the value order, so range predicates
  * and ORDER BY over ids equal the same operations over the strings.
  *
  * `declare` builds the dictionary DISTRIBUTED with the q315 plan — range
  * partition the distinct values, rank within each partition (partitioned
  * window, never a global one), add broadcast per-partition offsets — and
  * only then collects the bounded (value, id) pairs. The collect is the
  * dictionary itself, not data: dict-encoding is declared per column
  * exactly because its cardinality is bounded metadata (the reference's
  * dict(8/16/32) TEXT encodings carry the same contract), enforced by
  * `maxCardinality`. Declared dictionaries make `key_for_string(col)`
  * resolve to a codegen'd dense-id lookup (DictKey); undeclared columns
  * keep the xxhash64 surrogate.
  */
/** Identity-equality wrapper around the dictionary map: Expression
  * equality / plan canonicalization would otherwise DEEP-compare the
  * whole HashMap on every rule pass. DictRegistry hands out one holder
  * per declared column, so reference equality is exact.
  */
final class DictMap(
    val m: java.util.HashMap[UTF8String, java.lang.Long])
  extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case d: DictMap => d.m eq m
    case _ => false
  }
  override def hashCode(): Int = System.identityHashCode(m)
  override def toString: String = s"DictMap(${m.size()} entries)"
}

object DictRegistry {

  /** Registry key: SESSION-scoped (identity of the SparkSession — the
    * registry outlives nothing else) + lowercase column name. The entry
    * records the declaring table and the canonicalized source-plan hash
    * so that (a) re-declaring the same (table, column, source) is a
    * no-op returning the cached cardinality (the reference's build-once
    * StringDictionary lifecycle — round-8 q95 rebuilt per execution),
    * and (b) a declaration over a DIFFERENT source (new fixture dir,
    * mutated table) rebuilds. Declarations in one session can never
    * rebind `key_for_string` in another (round-8 ADVICE).
    */
  private final case class Key(sessionId: Int, column: String)
  private final case class Entry(table: String, planHash: Int,
      dict: DictMap)

  private val dicts = new ConcurrentHashMap[Key, Entry]()

  private def sid(spark: SparkSession): Int =
    System.identityHashCode(spark)

  /** Build + register the dictionary for `column` of `df`. Returns the
    * dictionary cardinality. NULLs are not dictionary members (the
    * reference reserves a sentinel id; SQL null-in null-out covers it).
    * `table` qualifies the declaration: `key_for_string(t.c)` only
    * resolves through it when `t` matches (bare `c` matches any
    * declaration of that column name in the session).
    */
  def declare(spark: SparkSession, df: DataFrame, column: String,
              maxCardinality: Int = 1 << 22, table: String = ""): Long = {
    val key = Key(sid(spark), column.toLowerCase)
    val planHash = df.queryExecution.analyzed.canonicalized.hashCode()
    val existing = dicts.get(key)
    if (existing != null && existing.planHash == planHash &&
        existing.table == table.toLowerCase)
      return existing.dict.m.size().toLong
    val vals = df.select(col(column).cast("string").as("v"))
      .na.drop().distinct()
    val parts = vals.repartitionByRange(8, col("v"))
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy(col("pid")).orderBy(col("v"))
    val ranked = parts.withColumn("rn", row_number().over(w) - 1)
    val counts = ranked.groupBy(col("pid"))
      .agg(count(lit(1)).as("c"))
      .collect().sortBy(_.getInt(0))
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), r) =>
      (r.getInt(0), acc + r.getLong(1))
    }
    import spark.implicits._
    val offDf = offsets.init.zip(offsets.tail)
      .map { case ((_, off), (pid, _)) => (pid, off) }
      .toSeq.toDF("pid", "off")
    val pairs = ranked.join(broadcast(offDf), "pid")
      .select(col("v"), (col("off") + col("rn")).as("id"))
      .collect()
    require(pairs.length <= maxCardinality,
      s"dictionary for $column has ${pairs.length} entries " +
        s"(> $maxCardinality): not a dict-encodable column")
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      pairs.length * 2)
    pairs.foreach(r => m.put(UTF8String.fromString(r.getString(0)),
      java.lang.Long.valueOf(r.getLong(1))))
    dicts.put(key, Entry(table.toLowerCase, planHash, new DictMap(m)))
    m.size().toLong
  }

  /** Resolve `key_for_string`'s argument name parts against this
    * session's declarations. A qualified reference (`t.c`) resolves only
    * if the declaration's table matches (a non-matching qualifier falls
    * back to the hash surrogate — it is NOT this dictionary's column); a
    * bare reference resolves by column name alone, which callers sharing
    * a column name across tables in one session must qualify.
    */
  def forColumn(spark: SparkSession, nameParts: Seq[String]): Option[DictMap] = {
    val e = Option(dicts.get(Key(sid(spark), nameParts.last.toLowerCase)))
    if (nameParts.length < 2) e.map(_.dict)
    else e.filter(en => en.table.isEmpty ||
      en.table == nameParts(nameParts.length - 2).toLowerCase)
      .map(_.dict)
  }

  def drop(spark: SparkSession, name: String): Unit =
    dicts.remove(Key(sid(spark), name.toLowerCase))
  def declared(spark: SparkSession): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = sid(spark)
    dicts.keys.asScala.collect { case Key(`s`, c) => c }.toSeq
  }
}

/** Dense dictionary-id lookup: `key_for_string` over a DECLARED column
  * (reference `Analyzer/Analyzer.h:914` KeyForStringExpr — returns the
  * column's dictionary id). The map rides in the expression like a
  * literal (driver-built bounded metadata, same shipping model as a
  * broadcast hash table), and the lookup stays inside whole-stage
  * codegen. Values absent from the dictionary yield NULL (the transient
  * dictionary case; callers treat it as "not in dictionary").
  */
case class DictKey(
    child: Expression,
    dict: DictMap)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "key_for_string"
  override def toString: String = s"key_for_string($child)"
  override def sql: String = s"key_for_string(${child.sql})"
  // Keep the map out of plan/argument printing.
  override def flatArguments: Iterator[Any] = Iterator(child)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else dict.m.get(v.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("dictMap", dict.m,
      "java.util.HashMap")
    val childGen = child.genCode(ctx)
    val hit = ctx.freshName("dictId")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${childGen.isNull}) {
          java.lang.Long $hit =
            (java.lang.Long) $mapRef.get(${childGen.value});
          if ($hit != null) {
            ${ev.isNull} = false;
            ${ev.value} = $hit.longValue();
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DictKey =
    copy(child = newChild)
}
