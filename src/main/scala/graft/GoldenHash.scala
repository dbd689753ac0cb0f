package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Canonical content hash for pinning query outputs that have no DuckDB
  * oracle (Spark-internal hash functions aren't expressible there). The
  * hash is partition- and row-order-independent, so a pinned value holds
  * across executors/partitionings; any schema or value drift changes it.
  */
object GoldenHash {

  /** SHA-256 over the sorted canonical row renderings, columns in name
    * order, with a schema header line — column renames fail the pin too.
    * Column renderings are NUL-separated (a byte that cannot occur in a
    * rendered value): an unseparated join would let adjacent-column
    * boundary shifts collide — ('12','3') vs ('1','23'). The collect is
    * test tooling only, and every pinned query's output is bounded
    * (per-doc profiles / top-k lists — thousands of rows at any pinned sf).
    */
  def tableHash(df: DataFrame): String = {
    val sep = 0.toChar.toString // NUL: cannot occur in a rendered value
    val cols = df.columns.sorted.toIndexedSeq
    val proj = df.select(cols.map(col): _*)
    val rows = proj.collect().map(_.mkString(sep)).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(cols.mkString(sep).getBytes("UTF-8"))
    md.update('\n'.toByte)
    rows.foreach { r =>
      md.update(r.getBytes("UTF-8"))
      md.update('\n'.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** The driver-contract queries without an oracle — the ones a golden
    * pin must guard.
    */
  def unoracledQueries: Seq[String] =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted

  /** Queries pinned in the golden sf files: the oracle-less set (EMPTY
    * since r13 — every registered query carries a DuckDB oracle) plus
    * rows that warrant a belt-and-suspenders cross-SF pin on top of
    * their true oracle: q27's portable-HLL estimate is a deterministic
    * DOUBLE whose silent drift (hash change, register-layout change)
    * should fail a pin even when no oracle run happens.
    */
  def pinnedQueries: Seq[String] =
    (unoracledQueries ++ Seq("q27_approx_distinct")).distinct.sorted
}
