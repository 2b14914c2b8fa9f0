package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container interchange path, built directly on the Avro
  * core library — there is no spark-avro module on this classpath, and
  * the container format (header schema + deflate-compressed record
  * blocks + sync markers) is simple enough that the reader/writer is the
  * same from-scratch treatment as the XLSX/XML stack. Schema-first like
  * the JSON/CSV paths in [[Formats]]: the caller's DDL is the CONTRACT,
  * compiled to the Avro reader schema so drift fails loudly at open
  * (Avro schema resolution rejects incompatible writer schemas) instead
  * of silently nulling columns.
  *
  * Scale shape: the write runs one task per input partition, each
  * streaming its rows into one container file through the Hadoop
  * FileSystem API — rows never collect. The read runs one task per
  * container file; blocks stream through `DataFileStream`, a file is
  * never loaded wholesale. Avro is row-major with NO column statistics —
  * predicates cannot prune files or skip columns, which is the scaladoc-
  * level reason this path is for INTERCHANGE, never an at-rest
  * analytical layout (re-encode to parquet at the door). */
object Avro {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    // the standard Avro logical annotations over their carrier types —
    // epoch days / epoch micros, exactly Spark's own internal encodings
    case DateType => org.apache.avro.LogicalTypes.date()
      .addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => org.apache.avro.LogicalTypes
      .localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    // money-safe interchange: Avro decimal = unscaled two's-complement
    // big-endian bytes under a (precision, scale) annotation
    case d: DecimalType => org.apache.avro.LogicalTypes
      .decimal(d.precision, d.scale)
      .addToSchema(Schema.create(Schema.Type.BYTES))
    case other => throw new IllegalArgumentException(
      s"unsupported Avro interchange type: ${other.catalogString}")
  }

  /** Avro record schema of a flat Spark struct; nullable fields map to
    * union(null, T), the standard Avro idiom. */
  def avroSchemaOf(st: StructType, name: String = "GraftRecord"): Schema = {
    import scala.jdk.CollectionConverters._
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType)
      val t =
        if (f.nullable) Schema.createUnion(
          java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, t, null, null.asInstanceOf[Object])
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Distributed container write: each input partition encodes one
    * `part-NNNNN.avro` under `path` (deflate blocks — java.util.zip, no
    * extra codec dependency). Executor-side streaming; the driver only
    * clears the target directory and triggers the job. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaOf(st).toString
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val width = st.length
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      // tasks run on the same filesystem the driver prepared; a fresh
      // Configuration resolves it identically (the parquetFooterManifest
      // precedent in Layouts)
      val schema = new Schema.Parser().parse(schemaJson)
      // Task-commit discipline: stream into an attempt-unique DOT-file
      // (invisible to readAvro's *.avro glob), rename to the final name
      // only after a clean close. A crashed or re-executed attempt then
      // leaves at most an ignored temp, never a PARTIAL container a later
      // read would decode — the same stage-then-publish rule the repo's
      // snapshot sinks follow.
      val att = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val tmp = new org.apache.hadoop.fs.Path(
        f"$path/.part-$pid%05d.avro.tmp-$att")
      val fin = new org.apache.hadoop.fs.Path(f"$path/part-$pid%05d.avro")
      val fs = tmp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(tmp, true)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(CodecFactory.deflateCodec(6))
      w.create(schema, out)
      var n = 0L
      rows.foreach { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < width) {
          val v =
            if (r.isNullAt(i)) null
            else r.get(i) match {
              // Avro's BYTES datum is a ByteBuffer, not byte[] — an
              // unwrapped array throws "Unknown datum type [B"
              case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
              // decimal: unscaled bytes at the DECLARED scale — setScale
              // throws on a scale mismatch that would need rounding
              // (FAILFAST) rather than silently changing the value
              case bd: java.math.BigDecimal =>
                val s = st.fields(i).dataType
                  .asInstanceOf[DecimalType].scale
                java.nio.ByteBuffer.wrap(
                  bd.setScale(s).unscaledValue().toByteArray)
              case bd: scala.math.BigDecimal =>
                val s = st.fields(i).dataType
                  .asInstanceOf[DecimalType].scale
                java.nio.ByteBuffer.wrap(
                  bd.underlying().setScale(s).unscaledValue().toByteArray)
              // date/timestamp carry as their Avro logical encodings
              // (epoch days int / epoch micros long); both external Java
              // forms handled — which one appears depends on
              // spark.sql.datetime.java8API.enabled
              case d: java.sql.Date => java.lang.Integer.valueOf(
                d.toLocalDate.toEpochDay.toInt)
              case d: java.time.LocalDate => java.lang.Integer.valueOf(
                d.toEpochDay.toInt)
              case t: java.sql.Timestamp => java.lang.Long.valueOf(
                Math.addExact(Math.multiplyExact(
                  Math.floorDiv(t.getTime, 1000L), 1000000L),
                  (t.getNanos / 1000).toLong))
              case t: java.time.Instant => java.lang.Long.valueOf(
                Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L),
                  (t.getNano / 1000).toLong))
              // TIMESTAMP_NTZ's external form: local epoch micros
              case t: java.time.LocalDateTime => java.lang.Long.valueOf(
                Math.addExact(Math.multiplyExact(
                  t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
                  (t.getNano / 1000).toLong))
              case x => x
            }
          rec.put(i, v)
          i += 1
        }
        w.append(rec)
        n += 1
      }
      w.close()
      if (fs.exists(fin)) fs.delete(fin, false) // lost-attempt leftover
      require(fs.rename(tmp, fin), s"publish failed: $tmp -> $fin")
      Iterator.single(n)
    }.count(): Unit
  }

  /** Schema-first container read: `schemaDdl` compiles to the Avro READER
    * schema, so field lookup is by name (writer reorder is fine) and an
    * incompatible writer schema fails at first record — FAILFAST, the
    * [[Formats]] contract. One task per file via `binaryFiles`; records
    * stream block-by-block. */
  def readAvro(spark: SparkSession, path: String, schemaDdl: String): DataFrame = {
    val st = StructType.fromDDL(schemaDdl)
    val schemaJson = avroSchemaOf(st).toString
    val width = st.length
    val fieldTypes = st.fields.map(_.dataType)
    // which external Java form the Row encoder expects for date/timestamp
    // is conf-dependent; match it so createDataFrame never class-casts
    val java8 = spark.conf
      .get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    val rows = spark.sparkContext.binaryFiles(s"$path/*.avro")
      .flatMap { case (_, pds) =>
        val reader = new Schema.Parser().parse(schemaJson)
        val din = new DataFileStream(pds.open(),
          new GenericDatumReader[GenericRecord](null, reader))
        // a LIMITed scan abandons the iterator before exhaustion — close
        // on task completion so the stream can't leak
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try din.close() catch { case _: Exception => () }
          })
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = din.hasNext
            if (!h) din.close()
            h
          }
          def next(): Row = {
            val rec = din.next()
            Row.fromSeq((0 until width).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: java.nio.ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.get(a)
                  fieldTypes(i) match {
                    case d: DecimalType => new java.math.BigDecimal(
                      new java.math.BigInteger(a), d.scale)
                    case _ => a
                  }
                case x => fieldTypes(i) match {
                  case DateType =>
                    val ld = java.time.LocalDate.ofEpochDay(
                      x.asInstanceOf[Number].longValue())
                    if (java8) ld else java.sql.Date.valueOf(ld)
                  case TimestampType =>
                    val us = x.asInstanceOf[Number].longValue()
                    val sec = Math.floorDiv(us, 1000000L)
                    val nano = (Math.floorMod(us, 1000000L) * 1000L).toInt
                    if (java8) java.time.Instant.ofEpochSecond(sec, nano.toLong)
                    else {
                      val t = new java.sql.Timestamp(sec * 1000L)
                      t.setNanos(nano)
                      t
                    }
                  case TimestampNTZType =>
                    val us = x.asInstanceOf[Number].longValue()
                    java.time.LocalDateTime.ofEpochSecond(
                      Math.floorDiv(us, 1000000L),
                      (Math.floorMod(us, 1000000L) * 1000L).toInt,
                      java.time.ZoneOffset.UTC)
                  case _ => x
                }
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, st)
  }

  /** "Encode once per dataset, query many" memo — the [[Formats]]
    * contract for the non-Spark-native format. */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def layoutFor(df: DataFrame, key: String): String = {
    val full = s"avro:$key:${Formats.fingerprint(df)}"
    val hit = built.get(full)
    if (hit != null) hit
    else synchronized {
      val again = built.get(full)
      if (again != null) again
      else {
        val path = graft.TmpArtifacts.path("graft-formats", full)
        writeAvro(df, path)
        built.put(full, path)
        path
      }
    }
  }
}
