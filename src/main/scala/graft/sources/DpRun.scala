package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** kmrdp / MPI-DP parity (ex/kmrdp.cpp — the rewrite of Akiyama Lab's
  * mpidp 1.0.3; ex/testdp.table is the file-format fixture): the
  * "ranked data processor" batch driver — a jobs-list TABLE file whose
  * header defines a TITLE and a PARAM command template, and whose body
  * lines are tab-separated field tuples; task i runs the template with
  * `$n` replaced by field n of row i, dispatched master-worker across
  * ranks, with per-task worker-id logging.
  *
  * Semantic mapping, piece by piece:
  *  - table file format (MPIDP::read_jobs_list, kmrdp.cpp:592-646):
  *    leading-space-stripped lines; '%'/'#' start comments; blank lines
  *    skipped; `TITLE=`/`PARAM=` headers (case-insensitive, as
  *    strncasecmp); remaining lines are task rows; the FIRST row fixes
  *    the field count and every row must match (xassert at :714).
  *    Reproduced verbatim in [[DpTable.parse]].
  *  - `$n` substitution + argv packing (make_argv_for_task,
  *    kmrdp.cpp:702-744): the template is expanded per row, then split
  *    on single spaces into an argv vector that is NUL-packed into one
  *    task value and fork-exec'd by the worker (put_task_list :665-693
  *    packs; kmr_exec_command runs). Reproduced: the expanded argv is
  *    joined with '\u0000', which routes [[CmdFarm.mapCommands]] to its
  *    fork-exec path — the same packed-argv wire format, byte for byte.
  *  - optional output-file position (-o N option, kmrdp.cpp:738):
  *    field N names the task's output file (retry suffixing ignored —
  *    "RETRY is ignored" per the reference's own MEMO). Surfaced as
  *    `out_file` in the result instead of prepending to argv: on Spark
  *    the natural sink is the returned DataFrame, not rank-local files.
  *  - master-worker dispatch + worker table (kmrdp.cpp:805-946 logs
  *    task→rank): the Spark scheduler is the master (same argument as
  *    CmdFarm); `rank` in the result is the executing partition id —
  *    the log-parity column — and is NON-deterministic across runs by
  *    design, so gates exclude it.
  *
  * Scale shape: the table file is driver-side tiny (a job script);
  * tasks shuffle as (taskno, argv-string) pairs only; execution cost
  * dominates dispatch exactly as in the reference. At 100 TB the table
  * would itself be a dataset — [[runTable]] takes a Dataset of rows, so
  * a billion-task table streams from parquet without a driver copy.
  */
object DpRun {

  /** Parsed jobs-list table: title, the PARAM template, field count,
    * optional output-file position (1-based), and the task rows. */
  final case class DpTable(title: String, param: String, nFields: Int,
      outFilePos: Int, rows: Seq[Seq[String]])

  object DpTable {
    /** Parse the MPI-DP table-file format (kmrdp.cpp:592-646). */
    def parse(text: String, outFilePos: Int = 0): DpTable = {
      var title = ""
      var param: String = null
      val rows = Seq.newBuilder[Seq[String]]
      var nFields = -1
      for (raw <- text.linesIterator) {
        val line = raw.dropWhile(c => c == ' ' || c == '\t')
        if (line.isEmpty || line(0) == '%' || line(0) == '#') ()
        else if (line.regionMatches(true, 0, "TITLE=", 0, 6))
          title = line.substring(6)
        else if (line.regionMatches(true, 0, "PARAM=", 0, 6))
          param = line.substring(6)
        else {
          // split on tabs; the first task row fixes the arity
          val fields = line.split('\t').toSeq
          if (nFields < 0) nFields = fields.length
          require(fields.length == nFields,
            s"task row arity ${fields.length} != table arity $nFields: $line")
          rows += fields
        }
      }
      require(param != null, "PARAM= field not found in table file")
      DpTable(title, param, math.max(nFields, 0), outFilePos, rows.result())
    }
  }

  /** Expand the PARAM template for one row ($1..$N, longest-first so
    * $12 wins over $1) and pack the space-split argv NUL-separated —
    * the reference's exact wire format for a task (kmrdp.cpp:665-744). */
  def packArgv(param: String, fields: Seq[String]): String = {
    var s = param
    for (i <- fields.indices.sortBy(i => -(i + 1).toString.length))
      s = s.replace("$" + (i + 1), fields(i))
    // strtok(" ") semantics: runs of separators collapse, no empties
    s.split(' ').filter(_.nonEmpty).mkString("\u0000")
  }

  /** Run a parsed table: every row becomes task (taskno, argv),
    * fork-exec'd under master-worker dispatch. Returns
    * (taskno, out_file, cmd, out, rank). */
  def run(spark: SparkSession, table: DpTable, workers: Int = 8,
      maxConcurrent: Int = 4): DataFrame = {
    import spark.implicits._
    val rows = spark.createDataset(
      table.rows.zipWithIndex.map { case (f, i) => (i.toLong, f) })
    runTable(table, rows, workers, maxConcurrent)
  }

  /** The scale path: task rows stream from any Dataset (a parquet
    * table of a billion rows, not a driver-side file). */
  def runTable(table: DpTable, rows: Dataset[(Long, Seq[String])],
      workers: Int, maxConcurrent: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val param = table.param
    val outPos = table.outFilePos
    val nFields = table.nFields
    val tasks = rows.map { case (taskno, fields) =>
      require(fields.length == nFields,
        s"task $taskno arity ${fields.length} != table arity $nFields")
      val outFile =
        if (outPos >= 1 && outPos <= fields.length) fields(outPos - 1) else "-"
      (taskno.toString, outFile, packArgv(param, fields))
    }.toDF("taskno", "out_file", "cmd")
      .repartition(workers)
    // the key survives the farm verbatim; U+0001 cannot appear in a
    // numeric taskno and out_file is a single tab-split field
    val execed = CmdFarm.mapCommands(
      tasks.select(concat_ws("\u0001", col("taskno"), col("out_file")).as("_1"),
        col("cmd").as("_2")).as[(String, String)],
      maxConcurrent)
    execed.toDF("k", "out")
      .select(split(col("k"), "\u0001").getItem(0).cast("long").as("taskno"),
        split(col("k"), "\u0001").getItem(1).as("out_file"),
        col("out"), spark_partition_id().as("rank"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- The full kmrdp path, end to end: a real table FILE (header
    // comments, TITLE=, PARAM= template with $1..$3), generated from
    // the documents table, parsed by the real parser, $-substituted,
    // NUL-packed and fork-exec'd (no shell — printf is argv[0]) under
    // master-worker dispatch. Every task computes a value the oracle
    // re-derives in SQL, proving the whole chain executed: a parse or
    // substitution bug changes stdout and fails the hash. `rank` (the
    // worker-table log column) is scheduler-dependent and excluded.
    QueryDef("dp_run", (s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(25L)) === 0)
        .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
        .orderBy("doc_id")
        .collect() // driver-side: kmrdp's table is a small job script
      val tableFile = new StringBuilder
      tableFile ++= "# jobs list generated from documents\n"
      tableFile ++= "TITLE=graft dp smoke\n"
      tableFile ++= "PARAM=printf %s/%s $1-$3 $2\n"
      for (r <- docs)
        tableFile ++= s"${r.getLong(0)}\t${r.getString(1)}\tL${r.getInt(2)}\n"
      val table = DpTable.parse(tableFile.result(), outFilePos = 2)
      run(s, table, workers = 8, maxConcurrent = 4)
        .select(col("taskno").as("doc_id"), col("out_file"), col("out"))
        .orderBy("doc_id")
    }, Some(
      """SELECT row_number() OVER (ORDER BY doc_id) - 1 AS doc_id,
           lang AS out_file,
           concat(CAST(doc_id AS VARCHAR), '-L', CAST(length(text) AS VARCHAR),
                  '/', lang) AS out
         FROM documents WHERE doc_id % 25 = 0 ORDER BY 1"""))
  )
}
