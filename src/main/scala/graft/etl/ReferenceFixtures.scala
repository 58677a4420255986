package graft.etl

/** The reference's golden data corpus, embedded as fixtures.
  *
  * Bodies are the exact full-load CSVs and CDC change files the reference
  * uploads (lib/query.py:2-13 full load, lib/query.py:16-27 CDC; layout per
  * run.py:162-164 and run.py:193-195). These pin the engine's replication
  * semantics: 16 full-load events and 15 CDC events (README.md:74-87).
  */
object ReferenceFixtures {
  val employeeCsv: String =
    """101,Smith,Bob,2014-06-04,New York
      |102,Smith,Bob,2015-10-08,Los Angeles
      |103,Smith,Bob,2017-03-13,Dallas
      |104,Smith,Bob,2017-03-13,Dallas""".stripMargin

  val departmentCsv: String =
    """201,HR
      |202,IT
      |203,Finance""".stripMargin

  val projectCsv: String =
    """301,Project1,Description1
      |302,Project2,Description2
      |303,Project3,Description3""".stripMargin

  /** cdc0000000001.csv — 4 ops, all hr.employee PK 101 (net: empty table). */
  val cdcFile1: String =
    """INSERT,employee,hr,101,Smith,Bob,2014-06-04,New York
      |UPDATE,employee,hr,101,Smith,Bob,2015-10-08,Los Angeles
      |UPDATE,employee,hr,101,Smith,Bob,2017-03-13,Dallas
      |DELETE,employee,hr,101,Smith,Bob,2017-03-13,Dallas""".stripMargin

  /** cdc0000000002.csv — 7 ops across 3 tables; includes the DELETE on
    * never-inserted department PK 301 (apply-exception path).
    */
  val cdcFile2: String =
    """INSERT,department,hr,204,Software
      |INSERT,employee,hr,101,Smith,Bob,2015-10-08,Los Angeles
      |INSERT,project,hr,101,Project1,Description1
      |DELETE,project,hr,101,Project1,Description1
      |DELETE,department,hr,301,Software
      |UPDATE,employee,hr,101,Smith,Bob,2017-03-13,Dallas
      |DELETE,employee,hr,101,Smith,Bob,2017-03-13,Dallas""".stripMargin

  def cdcLines: Seq[String] =
    (cdcFile1.linesIterator ++ cdcFile2.linesIterator).toSeq

  def fullLoadCsvs: Map[String, String] = Map(
    "employee" -> employeeCsv,
    "department" -> departmentCsv,
    "project" -> projectCsv
  )
}
