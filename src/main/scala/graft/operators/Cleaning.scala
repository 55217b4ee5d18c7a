package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row-level cleaning operators (SURVEY.md §2.2 / §2.7).
  *
  * Each operator is a pure `DataFrame => DataFrame` so the whole cleaning
  * pipeline stays one lazy Catalyst plan: the ~20 chained stages collapse
  * into a handful of physical projections (CollapseProject), and filters
  * are pushed into the source scan. Nothing here shuffles except
  * `dedupKeepFirst` (one shuffle on the dedup keys) and `distinctRows`.
  *
  * Reference provenance is cited per operator (R_groupe4.R lines).
  */
object Cleaning {

  /** P1 — blank/whitespace-only strings → null (ref `R_groupe4.R:45-46`,
    * `lapply(df, gsub("^\\s*$", NA, x))`). Applied to the given columns, or
    * to every string column when none are given.
    */
  def normalizeBlanks(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    targets.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(trim(col(c)) === "", lit(null: String)).otherwise(col(c)))
    }
  }

  /** P2 — full-row distinct (ref `R_groupe4.R:49`). One shuffle on all cols. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** P3 — keyed dedup keeping the FIRST row in an explicit deterministic
    * order (ref `R_groupe4.R:52`, `!duplicated(cbind(...))` keeps first in
    * file order). Spark has no row order, so "first" is defined over the
    * caller-supplied `order` columns (SURVEY.md §7 hard-part 1: use an
    * ingest id). Single hash-partition shuffle on `keys`; at 100 TB this is
    * the standard repartition-by-key + in-partition sort, no driver state.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** P4 — drop rows with null in any required column (ref `R_groupe4.R:55-70`,
    * 13 chained `filter(!is.na(...))`). One pushed-down predicate, no shuffle.
    */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame = df.na.drop(cols)

  /** P5 — sanity predicate, default-off to match the reference which
    * abandoned it (ref `R_groupe4.R:72-74`, commented out because it removed
    * ~4,000 trees). */
  def sanityFilter(df: DataFrame, predicate: Column, enabled: Boolean = false): DataFrame =
    if (enabled) df.filter(predicate) else df

  /** P6 — constant overwrite (ref `R_groupe4.R:77`, `src_geo = "Orthophoto"`). */
  def constantFill(df: DataFrame, c: String, value: String): DataFrame =
    df.withColumn(c, lit(value))

  /** P7 — winsorize: values above `threshold` → `cap` (ref `R_groupe4.R:80`,
    * `age_estim > 300 → 200` — note the reference caps to 200, not 300;
    * preserved verbatim by taking both numbers as parameters). */
  def winsorize(df: DataFrame, c: String, threshold: Double, cap: Double): DataFrame =
    df.withColumn(c, when(col(c) > threshold, lit(cap)).otherwise(col(c)))

  /** P8/P9/P14 — column pruning by name and by prefix
    * (ref `R_groupe4.R:83-87,203,1071-1072`). */
  def dropCols(df: DataFrame, cols: Seq[String]): DataFrame = df.drop(cols: _*)
  def dropColsByPrefix(df: DataFrame, prefix: String): DataFrame =
    df.drop(df.columns.filter(_.startsWith(prefix)).toSeq: _*)

  /** F2 — literal first-occurrence label replace (ref `R_groupe4.R:90-91`,
    * `str_replace(fk_stadedev, "Adulte", "adulte")`). `str_replace` replaces
    * only the first occurrence; for whole-value labels this equals a full
    * replace, which is what we use (documented deviation for mid-string
    * multi-occurrence inputs). */
  def relabel(df: DataFrame, c: String, from: String, to: String): DataFrame =
    df.withColumn(c, regexp_replace(col(c), java.util.regex.Pattern.quote(from), to))

  /** F3 — case normalization (ref `R_groupe4.R:178`,
    * `str_to_title(tolower(...))`). Spark's builtin `initcap` only breaks
    * on whitespace — "saint-martin" would stay "Saint-martin" — so this
    * uses the custom codegen'd [[graft.functions.TitleCase]] expression,
    * which matches str_to_title on hyphens/apostrophes. */
  def titleCase(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, graft.functions.TitleCase(col(c)))

  /** F8 — null → sentinel on string columns (ref `R_groupe4.R:209`,
    * `NA → "Inconnue"`). */
  def fillUnknown(df: DataFrame, sentinel: String, cols: Seq[String]): DataFrame =
    df.na.fill(sentinel, cols)
}
