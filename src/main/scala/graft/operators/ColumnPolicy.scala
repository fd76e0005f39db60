package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative COLUMN MASKING + ROW FILTER policies — the governance
  * layer every warehouse ships (Snowflake masking policies, Unity
  * Catalog column masks / row filters, BigQuery policy tags),
  * re-expressed as data: policies persist as one tiny parquet table
  * of (kind, target, role, rule) rows, and [[apply]] compiles the
  * rows matching the caller's ROLE into an ordinary projection +
  * filter over the source frame. Enforcement is therefore a PLAN
  * property — masks are Catalyst expressions codegen'd with the query,
  * row filters push down to the scan like any predicate — and policy
  * changes are data changes (no code deploy; audit = read the table).
  *
  * Mask kinds (all deterministic, so governed reads stay
  * oracle-checkable):
  *   - `hash`      — md5 of the string form: joinable pseudonym
  *   - `redact`    — typed NULL: column shape kept, content gone
  *   - `last4`     — string tail: the classic account-number mask
  *   - `zero_bucket` — integers floored to the nearest `rule` bucket
  *
  * A role with no matching rows reads everything — policies DENY by
  * exception, the warehouse convention; the fixture's `admin` proves
  * the unmasked path stays byte-identical.
  */
object ColumnPolicy {

  /** One policy row. `kind` ∈ mask kinds or "row_filter" (then `rule`
    * is a SQL predicate and `target` is ignored). */
  final case class Policy(kind: String, target: String, role: String, rule: String)

  def register(s: SparkSession, dir: String, policies: Seq[Policy]): Unit = {
    import s.implicits._
    policies
      .toDF("kind", "target", "role", "rule")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(dir)
  }

  def list(s: SparkSession, dir: String): Seq[Policy] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      s.read
        .parquet(dir)
        .collect()
        .map(r => Policy(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSeq
  }

  private def maskOf(kind: String, c: String, rule: String, df: DataFrame): Column = kind match {
    case "hash"   => md5(col(c).cast("string"))
    case "redact" => lit(null).cast(df.schema(c).dataType)
    case "last4"  => concat(lit("****"), substring(col(c).cast("string"), -4, 4))
    case "zero_bucket" =>
      // integer DIV, not a double divide — the bucket edge must be
      // exact (and engine-identical) at any magnitude
      expr(s"(CAST(`$c` AS BIGINT) DIV ${rule.toLong}) * ${rule.toLong}")
    case other => throw new IllegalArgumentException(s"unknown mask kind '$other'")
  }

  /** The governed view of `df` for `role`: matching masks rewrite
    * their columns in place (schema order and width unchanged —
    * consumers keep working), matching row filters AND together.
    * Unknown mask targets refuse loudly (a typo'd policy that silently
    * protected nothing is the failure mode this layer exists to
    * prevent). */
  def apply(s: SparkSession, dir: String, df: DataFrame, role: String): DataFrame = {
    val mine = list(s, dir).filter(_.role == role)
    val masks = mine.filter(_.kind != "row_filter")
    masks.foreach { p =>
      require(
        df.columns.contains(p.target),
        s"masking policy targets unknown column '${p.target}'"
      )
    }
    val byCol = masks.map(p => p.target -> p).toMap
    val projected = df.select(df.columns.map { c =>
      byCol.get(c) match {
        case Some(p) => maskOf(p.kind, c, p.rule, df).as(c)
        case None    => col(c)
      }
    }: _*)
    mine
      .filter(_.kind == "row_filter")
      .foldLeft(projected)((acc, p) => acc.filter(expr(p.rule)))
  }
}
