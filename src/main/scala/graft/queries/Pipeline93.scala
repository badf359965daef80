package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, fourteenth batch — ingest-robustness roundtrips:
  * record-delimited text framing and CSV quoting.
  */
object Pipeline93 {

  val entries: Seq[QEntry] = Seq(

    // Record-delimited text ingest: corpora ship as MULTILINE records
    // with a frame separator (WARC-style), not line-per-doc — the
    // framing operator is Spark's text source with a custom lineSep,
    // which splits on the separator instead of '\n' (the q69 JSONL
    // path handles escape-safe payloads; this one handles raw bodies,
    // legal because the fixture's single-line texts cannot contain
    // the frame). Roundtrip under the gate: serialize "HDR id=..
    // src=..\nBODY .." records, write one frame-separated file, read
    // it back with lineSep, parse header+body with one dotall regex,
    // census per source. The oracle recomputes the expected census
    // from the base table — a framing or parsing bug diverges.
    QEntry("q444_record_ingest",
      (s, d) => {
        val sep = "\n%%\n"
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val records = docs.select(concat(
          lit("HDR id="), col("doc_id"), lit(" src="), col("source"),
          lit("\nBODY "), col("text")).as("value"))
        val path = Scratch.dir(s, "q444_records")
        records.coalesce(1).write.mode("overwrite")
          .option("lineSep", sep).text(path)
        val re = "(?s)^HDR id=(\\d+) src=(\\S+)\nBODY (.*)$"
        s.read.option("lineSep", sep).text(path)
          .filter(length(col("value")) > 0) // trailing-frame artifact
          .select(
            regexp_extract(col("value"), re, 1).as("id_str"),
            regexp_extract(col("value"), re, 2).as("source"),
            regexp_extract(col("value"), re, 3).as("body"))
          .withColumn("parsed",
            (col("id_str") =!= "" && col("source") =!= "").cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_records"),
            sum(col("parsed")).as("n_parsed"),
            sum(length(col("body"))).as("body_chars"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_records,
                count(*) AS n_parsed,
                CAST(sum(len(text)) AS BIGINT) AS body_chars
              FROM documents GROUP BY source ORDER BY source""")),

    // CSV quoting torture roundtrip: the fields that break naive CSV
    // pipelines — embedded delimiters, embedded quotes (doubled on
    // write), embedded newlines (multiLine read), leading/trailing
    // spaces — written through the CSV sink and read back through the
    // CSV source; per variant kind, the census counts rows whose
    // round-tripped field is byte-identical to what was written. The
    // oracle knows every row must survive (count per kind from the
    // base draw), so one mangled quote anywhere diverges. Exercises:
    // writer quoting/escaping, multiLine parsing, quote-preserving
    // whitespace.
    QEntry("q445_csv_quoting_roundtrip",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val payload = docs
          .withColumn("kind",
            when(draw % 4 === 0, "comma")
              .when(draw % 4 === 1, "quote")
              .when(draw % 4 === 2, "newline")
              .otherwise(lit("spaces")))
          .withColumn("field",
            when(col("kind") === "comma",
              concat(lit("a,b,"), col("text")))
              .when(col("kind") === "quote",
                concat(lit("she said \"hi\" to "), col("text")))
              .when(col("kind") === "newline",
                concat(lit("line one"), lit("\n"), col("text")))
              .otherwise(concat(lit("  padded  "), col("text"))))
          .select(col("doc_id"), col("kind"), col("field"))
        val path = Scratch.dir(s, "q445_csv")
        // the WRITER also trims unquoted whitespace by default — both
        // sides of the roundtrip must opt out
        payload.coalesce(1).write.mode("overwrite")
          .option("header", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(path)
        val back = s.read
          .option("header", "true").option("multiLine", "true")
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(path)
          .select(col("doc_id").cast("long").as("doc_id"),
            col("kind").as("kind_rt"), col("field").as("field_rt"))
        payload.join(back, "doc_id")
          .withColumn("intact",
            (col("field") === col("field_rt") &&
              col("kind") === col("kind_rt")).cast("long"))
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_rows"), sum(col("intact")).as("intact"))
          .withColumn("verdict",
            when(col("intact") === col("n_rows"), "lossless")
              .otherwise(lit("mangled")))
          .orderBy(col("kind"))
      },
      Some("""WITH docs AS (
                SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 4 AS m
                FROM documents),
              g AS (
                SELECT CASE m WHEN 0 THEN 'comma' WHEN 1 THEN 'quote'
                  WHEN 2 THEN 'newline' ELSE 'spaces' END AS kind,
                  count(*) AS n_rows
                FROM docs GROUP BY m)
              SELECT kind, CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_rows AS BIGINT) AS intact,
                'lossless' AS verdict
              FROM g
              ORDER BY kind"""))
  )
}
