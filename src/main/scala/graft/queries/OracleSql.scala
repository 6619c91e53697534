package graft.queries

/** SQL-side twins of the exact-arithmetic helpers in
  * [[graft.engine.Functions]] — used when composing DuckDB oracle
  * statements so both engines round identically (see Core.scala scaladoc).
  */
object OracleSql {
  def avgMoneySql(x: String, cnt: String, scale: Int = 2): String = {
    val p = math.pow(10, scale).toLong
    s"FLOOR((2*CAST(SUM(CAST($x AS DECIMAL(12,2)))*$p AS BIGINT) + $cnt) / (2*$cnt)) / $p.0"
  }
  def avgIntExactSql(x: String, cnt: String, scale: Int = 2): String = {
    val p = math.pow(10, scale).toLong
    s"FLOOR((CAST(SUM($x) AS BIGINT)*${2 * p} + $cnt) / (2*$cnt)) / $p.0"
  }
  def sumMoneySql(x: String): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(12,2))), 2) AS DOUBLE)"
}
