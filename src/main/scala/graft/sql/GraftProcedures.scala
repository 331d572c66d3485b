package graft.sql

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.delta.DeltaTable

/** Maintenance operations as SQL procedures
  * (`CALL gd.system.optimize('default.t')`): the DSv2 ProcedureCatalog
  * surface over the engine's OPTIMIZE / VACUUM / CHECKPOINT / history
  * paths — the operational verbs a table needs at 100 TB, callable
  * from plain SQL like delta-spark's equivalents.
  */
private[sql] object GraftProcedures {

  def load(name: String, resolve: String => String,
      spark: () => SparkSession): Option[UnboundProcedure] = name match {
    case "optimize" => Some(proc("optimize",
      Seq(in("table", StringType), inDefault("zorder", BooleanType, "false"),
        inDefault("where", StringType, "NULL"),
        inDefault("zorder_by", StringType, "NULL")),
      new StructType().add("version", LongType)) { args =>
      val t = DeltaTable.forPath(spark(), resolve(args.getString(0)))
      val where =
        if (args.isNullAt(2)) None else Some(args.getString(2))
      val zorderBy =
        if (args.isNullAt(3)) Nil
        else args.getString(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      // conflicting arguments are user error, never silently dropped:
      // 'where' scopes bin-packing compaction only
      val zorderFlag = !args.isNullAt(1) && args.getBoolean(1)
      require(zorderBy.isEmpty || (where.isEmpty && !zorderFlag),
        "optimize: zorder_by cannot combine with 'where' or 'zorder'")
      require(!zorderFlag || where.isEmpty,
        "optimize: 'where' cannot combine with 'zorder' " +
          "(clustered rewrites are whole-table)")
      val v = if (zorderBy.nonEmpty) t.optimizeZorderBy(zorderBy)
      else if (!args.isNullAt(1) && args.getBoolean(1))
        t.optimizeClustered()
      else t.optimizeCompact(where = where)
      Seq(InternalRow(v))
    })
    case "reorg_purge" => Some(proc("reorg_purge",
      Seq(in("table", StringType),
        inDefault("where", StringType, "NULL")),
      new StructType().add("version", LongType)) { args =>
      val where =
        if (args.isNullAt(1)) None else Some(args.getString(1))
      Seq(InternalRow(DeltaTable.forPath(spark(),
        resolve(args.getString(0))).reorgPurge(where)))
    })
    case "auto_compact" => Some(proc("auto_compact",
      Seq(in("table", StringType),
        inDefault("min_num_files", LongType, "50")),
      new StructType().add("version", LongType)) { args =>
      val minN = if (args.isNullAt(1)) 50 else args.getLong(1).toInt
      DeltaTable.forPath(spark(), resolve(args.getString(0)))
        .autoCompact(minNumFiles = minN)
        .map(InternalRow(_)).toSeq
    })
    case "clone" => Some(proc("clone",
      Seq(in("table", StringType), in("target_path", StringType)),
      new StructType().add("version", LongType)) { args =>
      Seq(InternalRow(DeltaTable
        .forPath(spark(), resolve(args.getString(0)))
        .cloneShallow(args.getString(1))))
    })
    case "vacuum" => Some(proc("vacuum",
      Seq(in("table", StringType), inDefault("dry_run", BooleanType, "false")),
      new StructType().add("path", StringType)) { args =>
      val dry = !args.isNullAt(1) && args.getBoolean(1)
      DeltaTable.forPath(spark(), resolve(args.getString(0)))
        .vacuum(dryRun = dry)
        .map(p => InternalRow(UTF8String.fromString(p)))
    })
    case "fsck" => Some(proc("fsck",
      Seq(in("table", StringType), inDefault("dry_run", BooleanType, "false")),
      new StructType().add("path", StringType)) { args =>
      val dry = !args.isNullAt(1) && args.getBoolean(1)
      DeltaTable.forPath(spark(), resolve(args.getString(0)))
        .fsckRepair(dryRun = dry)
        .map(p => InternalRow(UTF8String.fromString(p)))
    })
    case "checkpoint" => Some(proc("checkpoint",
      Seq(in("table", StringType)),
      new StructType().add("version", LongType)) { args =>
      Seq(InternalRow(DeltaTable
        .forPath(spark(), resolve(args.getString(0))).checkpoint()))
    })
    case "restore" => Some(proc("restore",
      Seq(in("table", StringType), in("version", LongType)),
      new StructType().add("version", LongType)) { args =>
      Seq(InternalRow(DeltaTable
        .forPath(spark(), resolve(args.getString(0)))
        .restore(args.getLong(1))))
    })
    case "compact_log" => Some(proc("compact_log",
      Seq(in("table", StringType), in("lo", LongType),
        in("hi", LongType)),
      new StructType().add("version", LongType)) { args =>
      Seq(InternalRow(DeltaTable
        .forPath(spark(), resolve(args.getString(0)))
        .compactLog(args.getLong(1), args.getLong(2))))
    })
    case "detail" => Some(proc("detail",
      Seq(in("table", StringType)),
      new StructType().add("format", StringType).add("id", StringType)
        .add("location", StringType).add("version", LongType)
        .add("num_files", LongType).add("size_bytes", LongType)
        .add("partition_columns", StringType)
        .add("min_reader_version", IntegerType)
        .add("min_writer_version", IntegerType)
        .add("table_features", StringType)) { args =>
      val path = resolve(args.getString(0))
      val t = DeltaTable.forPath(spark(), path)
      val snap = t.snapshot()
      // live-file totals straight from the checksum when the chain is
      // intact (O(1)); one distributed count/sum over the replay
      // otherwise — never a driver collect of the file list
      val (nf, sz) = graft.delta.Checksum
        .read(graft.delta.Storage.fs(snap.tableRoot,
            spark().sessionState.newHadoopConf()),
          graft.delta.FileNames.logDir(snap.tableRoot), snap.version)
        .map(c => (c.numFiles, c.tableSizeBytes))
        .getOrElse {
          val r = new graft.delta.DeltaScan(snap, None).filesDF
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
              org.apache.spark.sql.functions.coalesce(
                org.apache.spark.sql.functions.sum("add.size"),
                org.apache.spark.sql.functions.lit(0L)))
            .head()
          (r.getLong(0), r.getLong(1))
        }
      val feats = (snap.protocol.readerFeatures.getOrElse(Nil) ++
        snap.protocol.writerFeatures.getOrElse(Nil)).distinct.sorted
      Seq(InternalRow(
        UTF8String.fromString("delta"),
        UTF8String.fromString(snap.metadata.id),
        UTF8String.fromString(path),
        snap.version, nf, sz,
        UTF8String.fromString(snap.metadata.partitionColumns.mkString(",")),
        snap.protocol.minReaderVersion, snap.protocol.minWriterVersion,
        UTF8String.fromString(feats.mkString(","))))
    })
    case "history" => Some(proc("history",
      Seq(in("table", StringType)),
      new StructType().add("version", LongType)
        .add("timestamp", LongType).add("operation", StringType)) { args =>
      DeltaTable.forPath(spark(), resolve(args.getString(0))).history()
        .map { case (v, ts, op) =>
          InternalRow(v, ts, UTF8String.fromString(op)) }
    })
    case "convert" => Some(proc("convert",
      Seq(in("path", StringType),
        inDefault("partition_schema", StringType, "NULL")),
      new StructType().add("num_files", LongType)) { args =>
      val ps =
        if (args.isNullAt(1)) new StructType()
        else StructType.fromDDL(args.getString(1))
      val t = DeltaTable.convert(spark(), args.getString(0), ps)
      Seq(InternalRow(t.snapshot().allAdds.count()))
    })
    case _ => None
  }

  val names: Seq[String] =
    Seq("optimize", "reorg_purge", "auto_compact", "clone", "vacuum",
      "fsck", "checkpoint", "compact_log", "detail", "history", "restore",
      "convert")

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String,
      dt: org.apache.spark.sql.types.DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def proc(procName: String, params: Seq[ProcedureParameter],
      outSchema: StructType)(body: InternalRow => Seq[InternalRow])
      : UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft-delta maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"graft-delta maintenance procedure $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val out = body(input).toArray
            Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = out
              override def readSchema(): StructType = outSchema
            }).iterator()
          }
        }
    }
}
