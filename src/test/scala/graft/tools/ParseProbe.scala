package graft.tools

/** Throwaway probe: does Spark 4.1's parser accept MATERIALIZED VIEW DDL
  * (and if so, as what plan), or throw ParseException (the seam our hand
  * parser hooks)? */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SessionFactory.local("parse-probe", "2")
    val p = spark.sessionState.sqlParser
    for (sql <- Seq(
      "CREATE MATERIALIZED VIEW cat.ns.v AS SELECT a, count(*) c FROM t GROUP BY a",
      "DROP MATERIALIZED VIEW cat.ns.v",
      "REFRESH MATERIALIZED VIEW cat.ns.v",
      "ALTER VIEW cat.ns.v AS SELECT 1 AS x",
      "ALTER VIEW cat.ns.v SET TBLPROPERTIES ('a'='b')",
      "ALTER VIEW cat.ns.v UNSET TBLPROPERTIES ('a')",
      "SHOW CREATE TABLE cat.ns.t",
      "SHOW CREATE VIEW cat.ns.v"
    )) {
      val r = try p.parsePlan(sql).getClass.getSimpleName
        catch { case e: Exception => s"${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}" }
      println(s"PROBE| $sql -> $r")
    }
    try {
      val cmv = p.parsePlan("CREATE MATERIALIZED VIEW spark_catalog.ns.v " +
        "TBLPROPERTIES ('a'='b') AS SELECT 1 AS x")
      cmv.collectFirst {
        case m: org.apache.spark.sql.catalyst.plans.logical.CreateMaterializedViewAsSelect =>
          println(s"PROBE| CMVAS tableSpec = ${m.tableSpec}")
      }
      println("PROBE| top node = " + cmv.getClass.getSimpleName)
    } catch {
      case e: Exception => println(s"PROBE| CMVAS TBLPROPERTIES -> ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
