package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.GraftFunctions._
import graft.operators.{GroupedMode, LinkAlign}
import graft.sources.{CsvManifests, Sinks, XmlDeclarations}

/** The reference system's three entry points as one-call library
  * pipelines — what a user of the reference actually runs day to day,
  * composed from the engine's operators:
  *
  *  - [[importDeclarations]] ≙ `python src/import_xml_history.py` (E1)
  *  - [[importManifests]]    ≙ `python src/process_excel_order.py` (E2)
  *  - [[train]]              ≙ `python src/batch_train.py` (E3)
  *
  * Each upgrades the reference's semantics where Spark can: E1's
  * import-then-move loop becomes a checkpointed drain (no reprocessing
  * after a batch commits; see [[Sinks.drainDeclarations]] for the crash
  * window both designs share), E2's per-file loop becomes one distributed
  * scan with a rejects audit, E3's cross-table MySQL transaction becomes
  * the crash-safe rename-based snapshot protocol. */
object Pipelines {

  /** Pipeline B: drain the declaration inbox (xml/zip drop directory) into
    * the history table; processed inputs are archived by the source
    * (ref `import_xml_history.py:165-218`). Blocks until the backlog is
    * drained when the caller awaits the returned query. */
  def importDeclarations(spark: SparkSession, inbox: String, target: String,
                         archiveDir: String, checkpoint: String): StreamingQuery =
    Sinks.drainDeclarations(spark, inbox, target, archiveDir, checkpoint)

  /** Pipeline A: ingest every manifest in `dir` (one distributed pass over
    * .csv/.xlsx/.xls, per-file layout dispatch in the scan tasks) and
    * append to the raw-orders table. Returns the rejected files
    * (file, reason) — the reference logs and skips them
    * (ref `process_excel_order.py:268-271`). */
  def importManifests(spark: SparkSession, dir: String, target: String): DataFrame = {
    import spark.implicits._
    CsvManifests.requireManifestDir(spark, dir)
    // one decode pass serves both outputs: re-deriving rejects from a
    // second scan would re-read and re-decode every file
    val parsed = CsvManifests.parsedLines(spark, dir).cache()
    try {
      Sinks.append(CsvManifests.finalizeBatch(parsed.toDF()), target)
      parsed.toDF()
        .where(col("format") === "error")
        .select(col("src_file"), col("description_cell").as("reason"))
        .as[(String, String)].collect().toSeq // file-level: small
        .toDF("src_file", "reason")
    } finally parsed.unpersist()
  }

  /** Pipeline A, streaming form: the drop-directory loop upgraded to a
    * checkpointed drain, like [[importDeclarations]] — use this for the
    * recurring ingest; [[importManifests]] for one-shot backfills with an
    * inline rejects report. */
  def importManifestsStream(spark: SparkSession, inbox: String, target: String,
                            archiveDir: String, checkpoint: String): StreamingQuery =
    Sinks.drainManifests(spark, inbox, target, archiveDir, checkpoint)

  /** Pipeline C: learn the informal→official description mapping
    * (ref `batch_train.py:54-176`): project + null-gate both tables (P1/P2
    * — pushed into the scans), link on cleaned bill-of-lading keys,
    * count-gate + ordinal-align, majority-vote per normalized informal
    * description, snapshot the knowledge base with a timestamped backup of
    * the previous one. Returns the backup path, if one was taken. */
  def train(spark: SparkSession, manifestsPath: String,
            declarationsPath: String, kbTarget: String,
            backupRoot: String): Option[String] = {
    val a = spark.read.parquet(manifestsPath)
      .where(col("mawb_no").isNotNull && col("hawb_no").isNotNull &&
        col("description_original").isNotNull) // P2, ref :69-70
      .select(linkKey(col("mawb_no"), col("hawb_no")).as("link_key"),
        col("data_source_file").as("a_src"), col("item_no"),
        col("description_original"))
    val b = spark.read.parquet(declarationsPath)
      .where(col("mawb_no").isNotNull && col("hawb_no").isNotNull &&
        col("description_official").isNotNull) // P2, ref :76
      .select(linkKey(col("mawb_no"), col("hawb_no")).as("link_key"),
        col("data_source_file").as("b_src"), col("item_sequence"),
        col("description_official"), col("ccc_code"))
    val aligned = LinkAlign.alignByOrdinal(a, b, "link_key",
      orderA = Seq(col("a_src"), col("item_no")),
      orderB = Seq(col("b_src"), col("item_sequence")))
    val kb = GroupedMode.modeBy(
      aligned.select(
        normalizeText(col("description_original")).as("original_description"),
        col("description_official"), col("ccc_code")),
      Seq("original_description"),
      Seq("description_official", "ccc_code"))
    Sinks.snapshotOverwrite(spark, kb, kbTarget, backupRoot)
  }
}
