package graft.sources

import graft.SparkSuite
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSuite {

  test("enumerateFiles walks directories recursively, files only") {
    val base = Paths.get("target/graft-tmp/enum_test")
    Files.createDirectories(base.resolve("sub"))
    Files.writeString(base.resolve("a.txt"), "alpha")
    Files.writeString(base.resolve("b.txt"), "beta")
    Files.writeString(base.resolve("sub/c.txt"), "gamma")
    val found = Ingest.enumerateFiles(spark, base.toString).collect()
    assert(found.length == 3)
    assert(found.forall(_.endsWith(".txt")))
    assert(found.exists(_.endsWith("sub/c.txt")))
  }

  test("mapFileNames reads every enumerated file's bytes") {
    val base = "target/graft-tmp/enum_test"
    val rows = Ingest.mapFileNames(spark, base, numPartitions = 2).collect()
    val byName = rows.map(r => (r.getString(0).split('/').last,
      new String(r.getAs[Array[Byte]](1), "UTF-8"))).toMap
    assert(byName == Map("a.txt" -> "alpha", "b.txt" -> "beta", "c.txt" -> "gamma"))
  }

  test("readTextLines numbers lines globally and contiguously") {
    val p = Paths.get("target/graft-tmp/lines_test.txt")
    Files.createDirectories(p.getParent)
    Files.writeString(p, (1 to 100).map(i => s"line$i").mkString("\n"))
    val rows = Ingest.readTextLines(spark, p.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 100L))
    assert(rows.head._2 == "line1" && rows.last._2 == "line100")
  }

  test("readTextLines numbers multi-file input in lexical file order, not split-size order") {
    // a.txt is the SMALLEST file: Spark orders splits by size descending,
    // so a naive zipWithIndex would number c/b before a. Lexical order is
    // the kmr_map_getline contract.
    val base = Paths.get("target/graft-tmp/lines_multi")
    Files.createDirectories(base)
    Files.writeString(base.resolve("a.txt"), "a1")
    Files.writeString(base.resolve("b.txt"), (1 to 50).map(i => s"b$i").mkString("\n"))
    Files.writeString(base.resolve("c.txt"), (1 to 200).map(i => s"c$i").mkString("\n"))
    val rows = Ingest.readTextLines(spark, base.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 251L))
    assert(rows.map(_._2).toSeq ==
      Seq("a1") ++ (1 to 50).map(i => s"b$i") ++ (1 to 200).map(i => s"c$i"))
  }

  test("PipeRun: shell mapper + shell reducer wordcount matches the DataFrame result") {
    import org.apache.spark.sql.functions._
    // write the corpus as text, wordcount it with awk executables only
    val dir = "target/graft-tmp/piperun_in"
    graft.Tables.load(spark, sfDir, "documents").select(col("text"))
      .write.mode("overwrite").text(dir)
    val mapper = Seq("awk", "{for(i=1;i<=NF;i++) print $i, 1}")
    val reducer = Seq("awk", "{s=0; for(i=2;i<=NF;i++) s+=$i; print $1, s}")
    val piped = PipeRun.run(spark, dir, mapper, reducer)
      .collect().map { l => val Array(w, n) = l.split(" "); (w, n.toLong) }.toMap
    val expected = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(piped == expected)
  }

  test("pipeLines round-trips records through an external process") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("a b c", "d e", "f"))
    val out = Ingest.pipeLines(ds, Seq("awk", "{print NF}")).collect().map(_.toInt).sorted
    assert(out.toSeq == Seq(1, 2, 3))
  }

  test("CSV round-trip preserves embedded delimiters, quotes, and unicode exactly") {
    // the ingest_csv writer/reader option pair, on text the gate data
    // never contains: commas, double quotes, pipes, unicode
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "comma, inside, twice", "en"),
      (3L, "a \"quoted\" word and a trailing quote\"", "de"),
      (4L, "pipes | and ; semicolons", "es"),
      (5L, "unicodé 中文 😀", "fr"))
    val dir = "target/graft-tmp/csv_quoting_spec"
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .csv(dir)
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING"))
      .csv(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(back.toSeq == rows.sorted)
  }

  test("XML round-trip preserves markup, entities, whitespace and unicode exactly") {
    // the ingest_xml writer/reader option pair, on text the gate data
    // never contains: angle brackets, ampersands, CDATA-looking spans,
    // leading/trailing spaces (ignoreSurroundingSpaces=false), unicode
    import spark.implicits._
    val rows = Seq(
      (1L, "plain text", "en"),
      (2L, "<tag> markup & entities &amp; raw", "en"),
      (3L, "nested <doc>fake row tag</doc> inside", "de"),
      (4L, "  leading and trailing spaces  ", "es"),
      (5L, "unicodé 中文 😀 ]]> bracket", "fr"))
    val dir = "target/graft-tmp/xml_escaping_spec"
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .option("rowTag", "doc").option("rootTag", "docs")
      .xml(dir)
    val back = spark.read
      .option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING"))
      .xml(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(back.toSeq == rows.sorted)
  }

  test("sink_compact actually compacts: 64 small files in, at most 2 data files out") {
    graft.SparkEntry.queries("sink_compact")(spark, sfDir).collect()
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(f => f.getName.startsWith("part-"))
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    assert(parts(s"target/graft-tmp/compact_$sf/small") == 64, "fragmentation fixture wrong")
    assert(parts(s"target/graft-tmp/compact_$sf/compacted") <= 2, "compaction did not reduce files")
  }

  test("mergeSchema read surfaces the evolved column as nullable, old rows as NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve_spec").toString
    Seq((1L, "en")).toDF("doc_id", "lang").write.parquet(s"$dir/v1")
    Seq((2L, "en", 40L)).toDF("doc_id", "lang", "n_chars").write.parquet(s"$dir/v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
    assert(merged.schema.fieldNames.contains("n_chars"))
    val rows = merged.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, None), (2L, Some(40L))))
    // without mergeSchema, footer sampling may drop the evolved column —
    // the default is NOT safe for evolved tables, which is the point
  }
}
