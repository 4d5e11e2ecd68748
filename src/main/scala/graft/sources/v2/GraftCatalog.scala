package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Directory-backed `TableCatalog` over graft-v2 tables: a table named
  * `<catalog>.ns1.ns2.t` lives at `<warehouse>/ns1/ns2/t`. Registering
  * it (`spark.sql.catalog.graft = graft.sources.v2.GraftCatalog`,
  * `spark.sql.catalog.graft.warehouse = <dir>`) is what routes the SQL
  * surface to the V2 source — `SELECT`/`INSERT INTO` and, critically,
  * `INSERT INTO ... REPLACE WHERE`, which Spark can only deliver to a
  * catalog table (`OverwriteByExpression` →
  * `GraftWriteBuilderV2.overwrite(filters)` → the footer-stats
  * classify/rewrite commit). The reference exposed its source the same
  * way a step earlier in Spark's evolution: a relation provider the
  * session resolves by name (ExtJdbcRelationProvider.scala:15-23).
  *
  * Table metadata is the data itself (parquet footers). The only side
  * state is a `.graft-schema.json` marker written at CREATE TABLE so
  * an empty table keeps its schema until first write; footers win once
  * data exists.
  */
object GraftCatalog {
  /** Schema marker a CREATE TABLE writes (and a DELETE/TRUNCATE that
    * empties a table refreshes) so an empty directory keeps its
    * schema; footers win once data exists. */
  val SchemaMarker = ".graft-schema.json"

  import org.apache.hadoop.fs.FileSystem

  /** Metadata-only DROP/RENAME COLUMN state, carried in the schema
    * marker below the DDL line:
    *
    *  - `renames`: PHYSICAL (in-file) name → current LOGICAL name.
    *    Old files keep their physical column; readers translate
    *    per file ([[PhysicalNames]]); files written after the rename
    *    carry the logical name directly (no translation needed), so a
    *    rename costs zero data bytes and mixed files read uniformly.
    *  - `drops`: physical names whose data is DEAD — projected away
    *    by every reader, and RESERVED: re-adding a column with a
    *    dropped (or rename-source) physical name is refused, because
    *    name-mapped files could not tell the new column from the old
    *    data (the restriction a field-id format lifts; this engine
    *    documents it instead of silently resurrecting columns). */
  final case class ColumnMapping(renames: Map[String, String],
      drops: Set[String]) {
    def isEmpty: Boolean = renames.isEmpty && drops.isEmpty
    /** Physical names no new logical column may take. */
    def reserved: Set[String] = renames.keySet ++ drops
    /** Translate a raw FOOTER schema to logical shape: dead columns
      * out, renamed columns under their logical name. */
    def translate(footer: StructType): StructType =
      if (isEmpty) footer
      else StructType(footer.fields
        .filterNot(f => drops.contains(f.name))
        .map(f => renames.get(f.name) match {
          case Some(logical) => f.copy(name = logical)
          case None => f
        }))
  }
  object ColumnMapping {
    val empty: ColumnMapping = ColumnMapping(Map.empty, Set.empty)
  }

  /** `ALTER COLUMN ... TYPE` widening lattice — the promotions whose
    * parquet encodings every reader upcasts losslessly per file
    * (Spark's vectorized decoder natively, the row converter
    * explicitly): the integral chain, FLOAT→DOUBLE, and DECIMAL
    * growth that loses neither integer digits nor scale. A widen is
    * METADATA-ONLY: the marker records the wide type, old files keep
    * their narrow physical encoding and upcast at read — the
    * type-axis twin of the DROP/RENAME name mapping. */
  private[graft] object TypeWidening {
    import org.apache.spark.sql.types._
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (f, t) if f == t => false
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        // precision growth at the SAME scale — the promotion Spark's
        // vectorized parquet updaters accept (a scale change would
        // re-encode unscaled values, which is not metadata-only)
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  private[graft] def readMarkerRaw(fs: FileSystem, dir: Path)
      : Option[Seq[String]] = {
    val p = new Path(dir, SchemaMarker)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(0, bytes)
        Some(new String(bytes, "UTF-8").split("\n").toSeq)
      } finally in.close()
    }
  }

  private[graft] def readMarker(fs: FileSystem, dir: Path)
      : Option[StructType] =
    // line 1 is the DDL; mapping lines (#rename= / #drop=) follow
    readMarkerRaw(fs, dir).flatMap(_.headOption)
      .map(StructType.fromDDL)

  /** One CHECK constraint as persisted in the marker
    * (`#check=<name>:<0|1 enforced>:<predicateSql>`). Reported
    * through `Table.constraints()`, where Spark's
    * `ResolveTableConstraints` enforces the enforced ones on every
    * catalog write (INSERT / UPDATE / MERGE); path-based writes
    * bypass the catalog and therefore the constraints — the same
    * boundary as every other catalog-level contract. */
  final case class CheckSpec(name: String, enforced: Boolean,
      predicateSql: String)

  private[graft] def readChecks(fs: FileSystem, dir: Path)
      : Seq[CheckSpec] =
    readMarkerRaw(fs, dir).map(_.filter(_.startsWith("#check="))
      .flatMap { l =>
        val v = l.stripPrefix("#check=")
        val i1 = v.indexOf(':')
        val i2 = if (i1 < 0) -1 else v.indexOf(':', i1 + 1)
        if (i1 <= 0 || i2 < 0) None
        else Some(CheckSpec(v.substring(0, i1),
          v.substring(i1 + 1, i2) == "1", v.substring(i2 + 1)))
      }).getOrElse(Nil)

  /** Column DEFAULT values as persisted in the marker:
    * `#default=<col>:<currentSql>` (the expression future INSERTs
    * without the column evaluate) and `#defaultex=<col>:<existsSql>`
    * (the value rows written BEFORE the column existed read — "NULL"
    * when the column was ALTER-ADDed without one). Both split on the
    * FIRST colon so the SQL text may contain colons. Reported through
    * the table schema's `CURRENT_DEFAULT` / `EXISTS_DEFAULT` field
    * metadata, where Spark's default-column resolution fills INSERT
    * gaps and the `DEFAULT` keyword. */
  private[graft] def readDefaults(fs: FileSystem, dir: Path)
      : Map[String, (String, Option[String])] =
    readMarkerRaw(fs, dir).map { lines =>
      def parse(prefix: String): Map[String, String] =
        lines.filter(_.startsWith(prefix)).flatMap { l =>
          val v = l.stripPrefix(prefix)
          val i = v.indexOf(':')
          if (i <= 0) None
          else Some(v.substring(0, i) -> v.substring(i + 1))
        }.toMap
      val cur = parse("#default=")
      val ex = parse("#defaultex=")
      cur.map { case (c, s) => c -> (s, ex.get(c)) }
    }.getOrElse(Map.empty)

  /** User table properties as persisted in the marker
    * (`#prop=<k>:<v>`, split on the FIRST colon). Spark-managed
    * reserved keys (provider/location/owner/...) are never stored —
    * they describe the catalog entry, not the table. */
  private[graft] val ReservedProps: Set[String] =
    Set("provider", "location", "comment", "owner", "external",
      "is_managed_location")

  private[graft] def readProps(fs: FileSystem, dir: Path)
      : Map[String, String] =
    readMarkerRaw(fs, dir).map(_.filter(_.startsWith("#prop="))
      .flatMap { l =>
        val v = l.stripPrefix("#prop=")
        val i = v.indexOf(':')
        if (i <= 0) None
        else Some(v.substring(0, i) -> v.substring(i + 1))
      }.toMap).getOrElse(Map.empty)

  /** Decorate a resolved schema with the marker's DEFAULT metadata —
    * the analyzer reads `CURRENT_DEFAULT`/`EXISTS_DEFAULT` off the
    * table columns to materialize omitted INSERT values. */
  private[graft] def applyDefaults(schema: StructType,
      ds: Map[String, (String, Option[String])]): StructType =
    if (ds.isEmpty) schema
    else StructType(schema.fields.map { f =>
      ds.get(f.name) match {
        case Some((cur, ex)) =>
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString("CURRENT_DEFAULT", cur)
          ex.foreach(mb.putString("EXISTS_DEFAULT", _))
          f.copy(metadata = mb.build())
        case None => f
      }
    })

  /** The DEFAULT metadata a CREATE's incoming schema carries (Spark
    * encodes each `DEFAULT expr` clause into the field metadata when
    * converting V2 columns). */
  private[graft] def extractDefaults(schema: StructType)
      : Map[String, (String, Option[String])] =
    schema.fields.flatMap { f =>
      if (f.metadata.contains("CURRENT_DEFAULT")) {
        Some(f.name -> (f.metadata.getString("CURRENT_DEFAULT"),
          if (f.metadata.contains("EXISTS_DEFAULT"))
            Some(f.metadata.getString("EXISTS_DEFAULT"))
          else None))
      } else None
    }.toMap

  /** Generated columns (`GENERATED ALWAYS AS (expr)`) as persisted in
    * the marker: `#genexpr=<col>:<sql>`, split on the FIRST colon.
    * Spark validates the expression at CREATE (deterministic, no
    * subqueries/aggregates, type-matches the column, references only
    * other non-generated columns); the write path computes omitted
    * values and validates explicit ones ([[GraftGenGuard]]). */
  private[graft] def readGens(fs: FileSystem, dir: Path)
      : Map[String, String] =
    readMarkerRaw(fs, dir).map(_.filter(_.startsWith("#genexpr="))
      .flatMap { l =>
        val v = l.stripPrefix("#genexpr=")
        val i = v.indexOf(':')
        if (i <= 0) None
        else Some(v.substring(0, i) -> v.substring(i + 1))
      }.toMap).getOrElse(Map.empty)

  /** Decorate a resolved schema with the marker's generation
    * expressions (`DESCRIBE` shows them; Spark's analyzer treats the
    * metadata as informational for an existing table). */
  private[graft] def applyGens(schema: StructType,
      gens: Map[String, String]): StructType =
    if (gens.isEmpty) schema
    else StructType(schema.fields.map { f =>
      gens.get(f.name) match {
        case Some(sql) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(org.apache.spark.sql.catalyst.util
              .GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY, sql)
            .build())
        case None => f
      }
    })

  /** The generation expressions a CREATE's incoming schema carries
    * (Spark encodes each `GENERATED ALWAYS AS` clause into field
    * metadata when converting V2 columns). */
  private[graft] def extractGens(schema: StructType)
      : Map[String, String] =
    schema.fields.flatMap(f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).map(f.name -> _)).toMap

  private[graft] def readMapping(fs: FileSystem, dir: Path)
      : ColumnMapping =
    readMarkerRaw(fs, dir) match {
      case None => ColumnMapping.empty
      case Some(lines) =>
        val renames = lines.filter(_.startsWith("#rename=")).flatMap { l =>
          val v = l.stripPrefix("#rename=")
          val i = v.lastIndexOf(':')
          if (i <= 0) None
          else Some(v.substring(0, i) -> v.substring(i + 1))
        }.toMap
        val drops = lines.filter(_.startsWith("#drop="))
          .map(_.stripPrefix("#drop=")).toSet
        ColumnMapping(renames, drops)
    }

  /** @param checks None PRESERVES the marker's current `#check=`
    *   lines (every schema-refresh path keeps standing constraints);
    *   Some(cs) replaces them (ALTER ADD/DROP CONSTRAINT and the
    *   schema-redefining overwrite, which clears them). */
  private[graft] def writeMarker(fs: FileSystem, dir: Path,
      schema: StructType, mapping: ColumnMapping,
      checks: Option[Seq[CheckSpec]] = None,
      defaults: Option[Map[String, (String, Option[String])]] = None,
      props: Option[Map[String, String]] = None,
      gens: Option[Map[String, String]] = None)
      : Unit = {
    val cs = checks.getOrElse(readChecks(fs, dir))
    // None PRESERVES standing defaults/properties/generations
    val ds = defaults.getOrElse(readDefaults(fs, dir))
    val ps = props.getOrElse(readProps(fs, dir))
    val gs = gens.getOrElse(readGens(fs, dir))
    // the DDL line must parse with StructType.fromDDL, which does not
    // accept DEFAULT clauses — strip the metadata (toDDL would render
    // it) and let the #default lines carry the defaults
    val cleanSchema = StructType(schema.fields.map { f =>
      if (f.metadata.contains("CURRENT_DEFAULT") ||
          f.metadata.contains("EXISTS_DEFAULT")) {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .remove("CURRENT_DEFAULT").remove("EXISTS_DEFAULT")
        f.copy(metadata = mb.build())
      } else f
    })
    // the marker is LINE-oriented: a newline smuggled inside any
    // persisted value (a TBLPROPERTIES value, a DEFAULT or generation
    // expression, a CHECK predicate) would split into stray marker
    // lines and corrupt the format — reject it at the one choke point
    // every persistence path funnels through, mirroring
    // GraftManifest.extraMeta's validation
    def safe(kind: String, s: String): String = {
      require(s.indexOf('\n') < 0 && s.indexOf('\r') < 0,
        s"$kind may not contain newlines (the schema marker is " +
          s"line-oriented): '${s.take(80)}'")
      s
    }
    val lines = Seq(cleanSchema.toDDL) ++
      mapping.renames.toSeq.sorted.map { case (p, l) =>
        s"#rename=${safe("column name", p)}:${safe("column name", l)}" } ++
      mapping.drops.toSeq.sorted.map(p =>
        s"#drop=${safe("column name", p)}") ++
      cs.sortBy(_.name).map(c =>
        s"#check=${safe("constraint name", c.name)}:" +
          s"${if (c.enforced) "1" else "0"}:" +
          safe("CHECK predicate", c.predicateSql)) ++
      ds.toSeq.sortBy(_._1).flatMap { case (c, (cur, ex)) =>
        Seq(s"#default=$c:${safe("DEFAULT expression", cur)}") ++
          ex.map(e => s"#defaultex=$c:${safe("DEFAULT expression", e)}")
      } ++
      ps.toSeq.sorted.map { case (k, v) =>
        s"#prop=${safe("property key", k)}:${safe("property value", v)}" } ++
      gs.toSeq.sorted.map { case (c, s) =>
        s"#genexpr=$c:${safe("generation expression", s)}" }
    val out = fs.create(new Path(dir, SchemaMarker), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** THE schema-merge rule: footers win for the columns they have —
    * EXCEPT when the marker records a WIDER type for a column
    * ([[TypeWidening]], `ALTER COLUMN TYPE`), which then wins (the
    * footer may be any old file's narrow encoding); marker fields the
    * footers lack are appended as nullable — what makes `ALTER TABLE
    * ADD COLUMNS` metadata-only. ONE definition, shared by
    * `resolveSchema`, the time-travel fallback and the manifest's
    * recorded `schema=` line, so they cannot diverge. Callers pass
    * the footer ALREADY TRANSLATED through the column mapping (see
    * [[translatedFooter]]). */
  private[graft] def mergeFooterAndMarker(footer: Option[StructType],
      marker: Option[StructType]): Option[StructType] =
    (footer, marker) match {
      case (Some(f), Some(m)) =>
        val markerByName = m.fields.map(mf => mf.name -> mf).toMap
        val widened = f.fields.map { ff =>
          markerByName.get(ff.name) match {
            case Some(mf) =>
              // marker nullability wins when MORE PERMISSIVE: the
              // sampled footer is ONE file — a marker-ADDed column
              // read from a post-evolution file whose writer declared
              // it REQUIRED must still resolve nullable, because
              // pre-evolution files lack the column entirely (a
              // non-nullable resolution both breaks their scans and
              // lets the optimizer constant-fold IsNotNull wrongly)
              val dt =
                if (TypeWidening.widens(ff.dataType, mf.dataType)) {
                  mf.dataType
                } else ff.dataType
              ff.copy(dataType = dt,
                nullable = ff.nullable || mf.nullable)
            case None => ff
          }
        }
        val extra = m.fields
          .filter(mf => !f.fieldNames.contains(mf.name))
          .map(_.copy(nullable = true))
        Some(StructType(widened ++ extra))
      case (f, m) => f.orElse(m)
    }

  /** The first file's footer schema in LOGICAL shape: dropped columns
    * out, renamed columns under their current names. */
  private[graft] def translatedFooter(fs: FileSystem, dir: Path)
      : Option[StructType] =
    FooterCache.schemaOption(dir.toString).map(ParquetMeta.toStruct)
      .map(readMapping(fs, dir).translate)

  /** THE table schema, shared by the catalog's `loadTable` and the
    * write path's append gate. */
  private[graft] def resolveSchema(fs: FileSystem, dir: Path)
      : Option[StructType] =
    mergeFooterAndMarker(
      translatedFooter(fs, dir),
      readMarker(fs, dir))
}

class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog
    with StagingTableCatalog {

  /** `CALL <cat>.system.vacuum/compact/zorder/materialize_dvs(...)` —
    * the SQL-first table-maintenance surface ([[GraftProcedures]]).
    * Procedures live under the `system` namespace (any namespace is
    * accepted — the name decides). */
  // stable instances: the analyzer re-loads/re-binds while iterating
  // to its fixed point, and plan equality is by procedure identity —
  // fresh objects per call would never converge
  private lazy val procedures: Map[String,
      org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure] =
    GraftProcedures.Names.map(n => n -> GraftProcedures.unbound(n,
      dotted => {
        val parts = dotted.split('.')
        if (parts.isEmpty || parts.exists(_.isEmpty)) {
          throw new IllegalArgumentException(
            s"graft procedure: bad table name '$dotted' (want ns.t)")
        }
        tableDir(Identifier.of(parts.init, parts.last))
      })).toMap

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure =
    procedures.getOrElse(
      ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new UnsupportedOperationException(
        s"graft catalog: no procedure '${ident.name()}' — available: " +
        GraftProcedures.Names.toSeq.sorted.mkString(", ")))

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    GraftProcedures.Names.toArray.sorted.map(n =>
      Identifier.of(Array("system"), n))

  private var catName: String = _
  private var warehouse: Path = _
  private var conf: Configuration = _

  private def SchemaMarker = GraftCatalog.SchemaMarker

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val w = options.get("warehouse")
    if (w == null || w.isEmpty) {
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse")
    }
    conf = GraftHadoopConf.sessionConf()
    warehouse = new Path(w)
    val fs = warehouse.getFileSystem(conf)
    if (!fs.exists(warehouse)) fs.mkdirs(warehouse)
  }

  override def name(): String = catName

  private def fs = warehouse.getFileSystem(conf)
  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)((p, s) => new Path(p, s))
  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace()), ident.name())

  private def isTableDir(dir: Path): Boolean =
    fs.exists(dir) && fs.getFileStatus(dir).isDirectory && (
      fs.exists(new Path(dir, SchemaMarker)) ||
      fs.listStatus(dir).exists(_.getPath.getName.endsWith(".parquet")))

  /** Advertises CHECK-constraint DDL and column-DEFAULT support —
    * what lets the analyzer route `ALTER TABLE ... ADD/DROP
    * CONSTRAINT` to [[alterTable]] and accept `DEFAULT expr` clauses
    * in CREATE/ALTER. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) {
      // metadata-table fallback (`SELECT * FROM cat.ns.t.files`):
      // the FULL identifier is not a table, but its parent is and the
      // name is a known metadata face — a REAL table named `files`
      // always shadows this (the isTableDir branch above wins)
      if (GraftMetaTables.Names.contains(ident.name()) &&
          ident.namespace().nonEmpty) {
        val parent = Identifier.of(
          ident.namespace().dropRight(1), ident.namespace().last)
        val pdir = tableDir(parent)
        if (isTableDir(pdir)) {
          return GraftMetaTables.load(fs, pdir, ident.name())
        }
      }
      throw new NoSuchTableException(ident)
    }
    val schema = resolveSchema(dir)
      .getOrElse(throw new NoSuchTableException(ident))
    // a directory laid out by GraftSink.saveBucketedFiles carries its
    // BucketLayout marker; surfacing it here is what turns catalog
    // joins on the bucket keys into storage-partitioned (shuffle-free)
    // joins — see GraftScanV2.outputPartitioning
    val gens = GraftCatalog.readGens(fs, dir)
    GraftTableV2(dir.toString,
      // DEFAULT metadata rides the schema: the analyzer fills INSERT
      // gaps and the DEFAULT keyword from these field-metadata keys.
      // Generated columns carry their expression as metadata only (a
      // simultaneous default is refused by Spark); an INSERT that
      // omits one lands NULL, which the writer treats as "absent —
      // compute" ([[GraftGenGuard]])
      GraftCatalog.applyDefaults(
        GraftCatalog.applyGens(schema, gens),
        GraftCatalog.readDefaults(fs, dir)),
      bucketSpec = graft.sources.BucketLayout.read(fs, dir),
      partitionSpec = graft.sources.PartitionLayout.read(fs, dir),
      // reported CHECK constraints: Spark's ResolveTableConstraints
      // enforces the enforced ones on every catalog write
      checkConstraints = GraftCatalog.readChecks(fs, dir),
      tableProps = GraftCatalog.readProps(fs, dir))
  }

  /** SQL time travel — `SELECT ... FROM t VERSION AS OF n`: the scan
    * pins manifest version n's file set ([[GraftManifest]]), resolving
    * archived files into `.graft-archive/`. Versions exist from a
    * table's first mutation (v1 = the pre-mutation state).
    *
    * The schema is the one RECORDED in the pinned version's manifest
    * (`schema=` meta line — the resolved shape at its commit instant),
    * so neither a later ALTER nor a schema-redefining overwrite
    * shape-shifts historical reads; manifests without the line fall
    * back to the pinned files' own footers ∪ the current marker. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) {
      // `SELECT * FROM cat.ns.t.files VERSION AS OF n` — the files
      // metadata table pins the named snapshot; history/tags describe
      // the whole log, so time travel on them is refused with guidance
      if (GraftMetaTables.Names.contains(ident.name()) &&
          ident.namespace().nonEmpty) {
        val parent = Identifier.of(
          ident.namespace().dropRight(1), ident.namespace().last)
        val pdir = tableDir(parent)
        if (isTableDir(pdir)) {
          if (ident.name() != "files") {
            throw new UnsupportedOperationException(
              s"graft catalog: VERSION AS OF on ${ident.name()} — " +
              "only the `files` metadata table time-travels (history " +
              "and tags describe the whole log)")
          }
          val v = try version.toLong catch {
            case _: NumberFormatException =>
              GraftTags.resolve(fs, pdir, version).getOrElse(
                throw new IllegalArgumentException(
                  s"graft catalog: VERSION AS OF takes a numeric " +
                  s"version or tag, got '$version'"))
          }
          return GraftMetaTables.load(fs, pdir, "files",
            versionAsOf = Some(v))
        }
      }
      throw new NoSuchTableException(ident)
    }
    // numeric literal, else a tag name ([[GraftTags]]) — tag names
    // can't start with a digit, so the spaces never collide
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        GraftTags.resolve(fs, dir, version).getOrElse {
          val tags = GraftTags.list(fs, dir)
          throw new IllegalArgumentException(
            s"graft catalog: VERSION AS OF takes a numeric manifest " +
            s"version (committed: ${GraftManifest.versions(fs, dir)
              .mkString(", ")}) or a tag name" +
            (if (tags.isEmpty) "" else
              s" (tags: ${tags.map(t => s"${t._1}=${t._2}")
                .mkString(", ")})") +
            s", got '$version'")
        }
    }
    // the manifest's recorded schema wins (exact shape at commit);
    // pre-schema-line manifests fall back to the pinned version's own
    // footers ∪ the current marker — only THEN is the snapshot
    // resolved (a listing round-trip the common path never pays), and
    // an unknown version still fails fast (read() throws, versions
    // named) on either branch
    val schema = GraftManifest.schemaAt(fs, dir, v).orElse {
      val pinned = GraftManifest.snapshotFiles(fs, dir, Some(v))
        .getOrElse(Seq.empty)
      GraftCatalog.mergeFooterAndMarker(
        pinned.headOption.flatMap(p =>
          FooterCache.schemaOption(p.toString).map(ParquetMeta.toStruct)),
        GraftCatalog.readMarker(fs, dir))
    }.getOrElse(throw new NoSuchTableException(ident))
    GraftTableV2(dir.toString, schema,
      bucketSpec = graft.sources.BucketLayout.read(fs, dir),
      partitionSpec = graft.sources.PartitionLayout.read(fs, dir),
      versionAsOf = Some(v))
  }

  /** SQL `TIMESTAMP AS OF t`: Spark hands the instant as epoch
    * MICROseconds; it maps to the latest manifest version whose
    * recorded commit wall-clock (`ts=` meta line) is at or before it,
    * then reads exactly like `VERSION AS OF`. */
  override def loadTable(ident: Identifier, timestampMicros: Long)
      : Table = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val v = GraftManifest.versionAt(fs, dir, timestampMicros / 1000L)
    loadTable(ident, v.toString)
  }

  /** `CLUSTERED BY (cols) INTO n BUCKETS` is accepted: the layout is
    * recorded in the `.graft-buckets.json` marker at create, INSERTs
    * route through the bucket-splitting V2 writer, and reads plan
    * storage-partitioned joins / bucket pruning. Other transforms
    * (dates, identity partitions, SORTED BY) are rejected — sort
    * columns come via `GraftSink.saveBucketedFiles`. */
  /** CLUSTERED BY (cols) INTO n BUCKETS — the only partition
    * transform this catalog accepts (shared by CREATE TABLE and the
    * staged CTAS/RTAS path). */
  private def parseBucketTransforms(partitions: Array[Transform])
      : Option[graft.sources.BucketLayout] = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    partitions match {
      case Array() => None
      case Array(t) if t.name == "bucket" =>
        val (lits, refs) = t.arguments().partition(_.isInstanceOf[Literal[_]])
        val n = lits match {
          case Array(l: Literal[_]) => l.value() match {
            case i: java.lang.Integer => i.intValue()
            case other => throw new UnsupportedOperationException(
              s"graft catalog: non-integer bucket count $other")
          }
          case _ => throw new UnsupportedOperationException(
            s"graft catalog: cannot parse bucket transform $t")
        }
        val cols = refs.map {
          case r: NamedReference if r.fieldNames().length == 1 =>
            r.fieldNames()(0)
          case other => throw new UnsupportedOperationException(
            s"graft catalog: bucket columns must be top-level, got $other")
        }
        Some(graft.sources.BucketLayout(n, cols.toSeq, Nil))
      case other if other.forall(_.name == "identity") =>
        None // identity transforms: parsePartitionTransforms' job
      case other =>
        throw new UnsupportedOperationException(
          "graft catalog: only CLUSTERED BY (cols) INTO n BUCKETS " +
          "and PARTITIONED BY (cols) " +
          s"partitioning is supported, got ${other.mkString(", ")}")
    }
  }

  /** SQL `PARTITIONED BY (col, …)` arrives as identity transforms:
    * they declare a HIDDEN-partitioning layout
    * ([[graft.sources.PartitionLayout]] — value-clustered flat files
    * with name-embedded digests, not `col=val/` directories). Mixed
    * identity + bucket transforms are refused. */
  private def parsePartitionTransforms(partitions: Array[Transform],
      schema: StructType): Option[graft.sources.PartitionLayout] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (partitions.isEmpty || partitions.exists(_.name == "bucket")) {
      if (partitions.count(_.name == "bucket") != partitions.length &&
          partitions.nonEmpty) {
        throw new UnsupportedOperationException(
          "graft catalog: PARTITIONED BY cannot mix bucket and " +
          s"identity transforms: ${partitions.mkString(", ")}")
      }
      return None
    }
    val cols = partitions.map { t =>
      if (t.name != "identity") {
        throw new UnsupportedOperationException(
          s"graft catalog: unsupported partition transform $t — " +
          "PARTITIONED BY (col, …) and CLUSTERED BY … INTO n BUCKETS " +
          "are the supported layouts")
      }
      t.arguments() match {
        case Array(r: NamedReference) if r.fieldNames().length == 1 =>
          r.fieldNames()(0)
        case other => throw new UnsupportedOperationException(
          s"graft catalog: partition columns must be top-level, " +
          s"got ${other.mkString(", ")}")
      }
    }.toSeq
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: partition column $c not in table schema " +
          schema.catalogString))
      if (!graft.sources.PartitionLayout.supportedType(f.dataType)) {
        throw new UnsupportedOperationException(
          s"graft catalog: partition column $c of type " +
          s"${f.dataType.simpleString} has no canonical value " +
          "rendering — partition on string/integral/date/timestamp/" +
          "boolean columns")
      }
    }
    Some(graft.sources.PartitionLayout(cols))
  }

  /** The modern CREATE entry point: Spark 4 hands V2 `Column`s whose
    * `generationExpression()` the default StructType shim DROPS — so
    * the expressions are pulled here, before the conversion. */
  override def createTable(ident: Identifier,
      columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val schema = org.apache.spark.sql.graftbridge.ColumnBridge
      .v2ColumnsToStructType(columns)
    val gens = columns.flatMap(c =>
      Option(c.generationExpression()).map(c.name -> _)).toMap
    doCreateTable(ident, schema, partitions, properties, gens)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    doCreateTable(ident, schema, partitions, properties,
      GraftCatalog.extractGens(schema))

  private def doCreateTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String],
      gens: Map[String, String]): Table = {
    val bucketSpec = parseBucketTransforms(partitions)
    val partitionSpec = parsePartitionTransforms(partitions, schema)
    val dir = tableDir(ident)
    if (isTableDir(dir)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(dir)
    // `DEFAULT expr` clauses arrive as field metadata on the incoming
    // schema (Spark's V2-column conversion); persist them as marker
    // lines — toDDL drops metadata by design
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap
      .filterNot { case (k, _) =>
        GraftCatalog.ReservedProps.contains(k) || k.startsWith("option.")
      }
    GraftCatalog.writeMarker(fs, dir, schema, GraftCatalog.ColumnMapping.empty,
      checks = Some(Nil),
      defaults = Some(GraftCatalog.extractDefaults(schema)),
      props = Some(userProps),
      gens = Some(gens))
    bucketSpec.foreach(graft.sources.BucketLayout.write(fs, dir, _))
    partitionSpec.foreach(
      graft.sources.PartitionLayout.write(fs, dir, _))
    GraftTableV2(dir.toString, schema, bucketSpec = bucketSpec,
      tableProps = userProps, partitionSpec = partitionSpec)
  }

  // ===== atomic CTAS / RTAS (StagingTableCatalog) =====
  //
  // `CREATE TABLE ... AS SELECT` and `REPLACE TABLE ... AS SELECT`
  // must be all-or-nothing: without a staging catalog Spark creates
  // the table, runs the write, and best-effort-drops on failure — a
  // crashed driver leaves a half-written table, and a REPLACE exposes
  // readers to an empty table mid-write. Here the query writes into a
  // hidden sibling staging directory; commit is a same-directory
  // rename (atomic on POSIX; an object-store deployment routes table
  // COMMITS through CommitStore, but directory swap granularity is
  // what CTAS needs). Readers of a replaced table see the old
  // contents until the instant of the swap.

  override def stageCreate(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, replace = false,
      orCreate = false, properties)

  override def stageReplace(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, replace = true,
      orCreate = false, properties)

  override def stageCreateOrReplace(ident: Identifier,
      columns: Array[Column], partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable =
    stage(ident, columns, partitions, replace = true,
      orCreate = true, properties)

  private def stage(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], replace: Boolean,
      orCreate: Boolean,
      properties: util.Map[String, String]): StagedTable = {
    // bridge conversion keeps DEFAULT/comment metadata (a plain
    // name/type/nullable rebuild would drop the DEFAULT clauses)
    val schema = org.apache.spark.sql.graftbridge.ColumnBridge
      .v2ColumnsToStructType(columns)
    val bucketSpec = parseBucketTransforms(partitions)
    val dir = tableDir(ident)
    // eager existence gate (same errors the non-staged path throws);
    // commit re-checks under the table lock for the race window
    if (!replace && isTableDir(dir)) {
      throw new TableAlreadyExistsException(ident)
    }
    if (replace && !orCreate && !isTableDir(dir)) {
      throw new NoSuchTableException(ident)
    }
    val parent = dir.getParent
    fs.mkdirs(parent)
    val staging = new Path(parent, s".graft-staging-${ident.name()}-" +
      java.util.UUID.randomUUID().toString.take(8))
    fs.mkdirs(staging)
    import scala.jdk.CollectionConverters._
    val userProps = properties.asScala.toMap
      .filterNot { case (k, _) =>
        GraftCatalog.ReservedProps.contains(k) || k.startsWith("option.")
      }
    GraftCatalog.writeMarker(fs, staging, schema, GraftCatalog.ColumnMapping.empty,
      checks = Some(Nil),
      defaults = Some(GraftCatalog.extractDefaults(schema)),
      props = Some(userProps))
    bucketSpec.foreach(graft.sources.BucketLayout.write(fs, staging, _))
    val partitionSpec = parsePartitionTransforms(partitions, schema)
    partitionSpec.foreach(
      graft.sources.PartitionLayout.write(fs, staging, _))
    new GraftStagedTable(ident, dir, staging, schema, bucketSpec,
      partitionSpec, replace, orCreate)
  }

  /** The staged twin: a fully functional graft-v2 table rooted at the
    * staging directory (the CTAS query's write lands there through
    * the normal write path, commit protocol included), promoted to
    * the final directory by [[commitStagedChanges]]. */
  private class GraftStagedTable(ident: Identifier, finalDir: Path,
      staging: Path, stagedSchema: StructType,
      bucketSpec: Option[graft.sources.BucketLayout],
      partitionSpec: Option[graft.sources.PartitionLayout],
      replace: Boolean, orCreate: Boolean)
      extends StagedTable with SupportsWrite {
    private val inner =
      GraftTableV2(staging.toString, stagedSchema,
        bucketSpec = bucketSpec, partitionSpec = partitionSpec)
    override def name(): String =
      s"graft-v2:${ident.name()} (staged)"
    override def schema(): StructType = stagedSchema
    override def partitioning(): Array[Transform] = inner.partitioning()
    override def capabilities(): util.Set[TableCapability] =
      inner.capabilities()
    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder =
      inner.newWriteBuilder(info)

    override def commitStagedChanges(): Unit = {
      GraftManifest.commitLock(fs, finalDir).synchronized {
        if (isTableDir(finalDir)) {
          if (!replace) {
            fs.delete(staging, true)
            throw new TableAlreadyExistsException(ident)
          }
          // swap: park the old table, promote the staging dir, then
          // drop the parked copy — a failed promote restores the old
          val trash = new Path(finalDir.getParent,
            s".graft-trash-${finalDir.getName}-" +
              java.util.UUID.randomUUID().toString.take(8))
          if (!fs.rename(finalDir, trash)) {
            throw new IllegalStateException(
              s"graft CTAS: cannot park $finalDir for replacement")
          }
          if (!fs.rename(staging, finalDir)) {
            fs.rename(trash, finalDir)
            throw new IllegalStateException(
              s"graft CTAS: cannot promote $staging to $finalDir")
          }
          fs.delete(trash, true)
        } else {
          if (replace && !orCreate) {
            fs.delete(staging, true)
            throw new NoSuchTableException(ident)
          }
          if (!fs.rename(staging, finalDir)) {
            throw new IllegalStateException(
              s"graft CTAS: cannot promote $staging to $finalDir")
          }
        }
      }
      // plans/footers cached against the replaced table describe the
      // parked copy; resolve fresh on the next read
      try {
        org.apache.spark.sql.SparkSession.active.catalog
          .refreshByPath(finalDir.toString)
      } catch { case _: Throwable => }
    }

    override def abortStagedChanges(): Unit = fs.delete(staging, true)
  }

  /** See [[GraftCatalog.resolveSchema]] — footers win for the columns
    * they have, marker extras append as nullable (metadata-only
    * `ALTER TABLE ADD COLUMNS`). */
  private def resolveSchema(dir: Path): Option[StructType] =
    GraftCatalog.resolveSchema(fs, dir)

  /** `ALTER TABLE ADD COLUMNS` — metadata-only schema evolution: the
    * evolved schema is recorded in the marker; existing files are
    * untouched and read NULL for the new columns. Columns must be
    * top-level, nullable, defaultless, and appended (no position) —
    * anything else would need a data rewrite this catalog refuses to
    * do implicitly. Other ALTERs (drop/rename/retype) are rejected. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    import GraftCatalog.ColumnMapping
    val dir = tableDir(ident)
    if (!isTableDir(dir)) throw new NoSuchTableException(ident)
    val current = resolveSchema(dir)
      .getOrElse(throw new NoSuchTableException(ident))
    val layoutCols: Set[String] = graft.sources.BucketLayout
      .read(fs, dir).map(b => (b.bucketCols ++ b.sortCols).toSet)
      .getOrElse(Set.empty)
    // partition columns are layout columns too: the hidden-
    // partitioning marker and file-name digests are keyed by name —
    // a rename would break appends and orphan the pruning
    val partitionCols: Set[String] = graft.sources.PartitionLayout
      .read(fs, dir).map(_.cols.toSet).getOrElse(Set.empty)
    var mapping = GraftCatalog.readMapping(fs, dir)
    var checks = GraftCatalog.readChecks(fs, dir)
    var defaults = GraftCatalog.readDefaults(fs, dir)
    var props = GraftCatalog.readProps(fs, dir)
    var gens = GraftCatalog.readGens(fs, dir)
    // same conservative word-boundary test as CHECKs: a generation
    // expression mentioning a column blocks dropping/renaming it
    def genReferencing(col: String): Option[(String, String)] = {
      val re = ("(?i)\\b" + java.util.regex.Pattern.quote(col) + "\\b").r
      gens.find { case (g, sql) =>
        g != col && re.findFirstIn(sql).isDefined }
    }
    // conservative word-boundary reference test: a check whose SQL
    // mentions a column blocks dropping/renaming it (re-binding the
    // predicate text is not something a metadata-only path should
    // guess at)
    def checkReferencing(col: String): Option[GraftCatalog.CheckSpec] = {
      val re = ("(?i)\\b" + java.util.regex.Pattern.quote(col) + "\\b").r
      checks.find(c => re.findFirstIn(c.predicateSql).isDefined)
    }
    val evolved = changes.foldLeft(current) {
      case (sch, add: TableChange.AddColumn) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: ADD COLUMN ${add.fieldNames.mkString(".")} " +
            s"— $why")
        if (add.fieldNames.length != 1) fail("must be top-level")
        val name = add.fieldNames()(0)
        if (sch.fieldNames.exists(_.equalsIgnoreCase(name))) {
          fail("already exists")
        }
        if (mapping.reserved.exists(_.equalsIgnoreCase(name))) {
          fail("the name belongs to a DROPPED or RENAMED column still " +
            "physically present in old files; name-mapped files could " +
            "not tell the new column from the old data — pick another " +
            "name, or rewrite the table first")
        }
        if (!add.isNullable) {
          fail("must be nullable (existing rows read NULL)")
        }
        if (add.position() != null) {
          fail("position is not supported (columns append)")
        }
        if (add.defaultValue() != null) {
          fail("DEFAULT is not supported (existing rows read NULL)")
        }
        val f = StructField(name, add.dataType, nullable = true)
        sch.add(Option(add.comment()).map(f.withComment).getOrElse(f))
      case (sch, rn: TableChange.RenameColumn) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: RENAME COLUMN " +
            s"${rn.fieldNames.mkString(".")} — $why")
        if (rn.fieldNames.length != 1) fail("must be top-level")
        val from = rn.fieldNames()(0)
        val to = rn.newName()
        val idx = sch.fieldNames.indexOf(from)
        if (idx < 0) fail("no such column")
        if (sch.fieldNames.exists(_.equalsIgnoreCase(to))) {
          fail(s"'$to' already exists")
        }
        if (mapping.reserved.exists(_.equalsIgnoreCase(to))) {
          fail(s"'$to' belongs to a dropped/renamed column still " +
            "physically present in old files")
        }
        if (layoutCols.contains(from)) {
          fail("the column is part of the bucket layout; the layout's " +
            "co-location contract is keyed by name — rewrite with " +
            "GraftSink.saveBucketedFiles instead")
        }
        if (partitionCols.contains(from)) {
          fail("the column is a hidden-partitioning column; the " +
            "layout marker and file-name digests are keyed by name — " +
            "rewrite the table to re-partition")
        }
        checkReferencing(from).foreach(c =>
          fail(s"CHECK constraint '${c.name}' references it " +
            s"(${c.predicateSql}); drop the constraint first"))
        genReferencing(from).foreach { case (g, sql) =>
          fail(s"generated column '$g' ($sql) references it; drop " +
            "the generated column first") }
        // a generated column's own expression rides the rename
        gens = gens.map { case (c, s) =>
          (if (c == from) to else c) -> s
        }
        // metadata-only: old files keep their PHYSICAL spelling; the
        // mapping routes every spelling to the new logical name. A
        // column renamed twice accumulates entries (a→b→c stores a→c
        // AND b→c) because files written BETWEEN the renames carry the
        // intermediate name physically
        val repointed = mapping.renames.map { case (p, l) =>
          p -> (if (l == from) to else l)
        }
        mapping = ColumnMapping(repointed + (from -> to), mapping.drops)
        // the DEFAULT rides the logical name
        defaults = defaults.map { case (c, d) =>
          (if (c == from) to else c) -> d
        }
        // the bloom index is keyed by LOGICAL name: drop the old
        // name's sidecars so a future column re-using it can never
        // match another column's filters (the index is an
        // optimization — dropping is always safe)
        BloomIndex.drop(fs, dir, from)
        StructType(sch.fields.updated(idx,
          sch.fields(idx).copy(name = to)))
      case (sch, del: TableChange.DeleteColumn) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: DROP COLUMN " +
            s"${del.fieldNames.mkString(".")} — $why")
        if (del.fieldNames.length != 1) fail("must be top-level")
        val name = del.fieldNames()(0)
        if (!sch.fieldNames.contains(name)) fail("no such column")
        if (sch.length == 1) fail("cannot drop the only column")
        if (layoutCols.contains(name)) {
          fail("the column is part of the bucket layout — rewrite with " +
            "GraftSink.saveBucketedFiles instead")
        }
        if (partitionCols.contains(name)) {
          fail("the column is a hidden-partitioning column — rewrite " +
            "the table to re-partition")
        }
        checkReferencing(name).foreach(c =>
          fail(s"CHECK constraint '${c.name}' references it " +
            s"(${c.predicateSql}); drop the constraint first"))
        genReferencing(name).foreach { case (g, sql) =>
          fail(s"generated column '$g' ($sql) references it; drop " +
            "the generated column first") }
        gens = gens - name // dropping the generated column itself
        // tombstone every physical spelling: the original physical
        // name if the column was renamed, plus the logical name (newer
        // files carry it directly)
        val physicals = mapping.renames.collect {
          case (p, l) if l == name => p
        }.toSet + name
        mapping = ColumnMapping(
          mapping.renames.filterNot { case (_, l) => l == name },
          mapping.drops ++ physicals)
        // same logical-name hygiene as RENAME: a re-added column must
        // not inherit the dropped column's bloom sidecars (nor its
        // DEFAULT)
        BloomIndex.drop(fs, dir, name)
        defaults = defaults - name
        StructType(sch.fields.filterNot(_.name == name))
      case (sch, ut: TableChange.UpdateColumnType) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: ALTER COLUMN " +
            s"${ut.fieldNames.mkString(".")} TYPE ${ut.newDataType} " +
            s"— $why")
        if (ut.fieldNames.length != 1) fail("must be top-level")
        val name = ut.fieldNames()(0)
        val idx = sch.fieldNames.indexOf(name)
        if (idx < 0) fail("no such column")
        if (layoutCols.contains(name)) {
          fail("the column is part of the bucket layout; bucket ids " +
            "hash the physical representation — rewrite with " +
            "GraftSink.saveBucketedFiles instead")
        }
        if (gens.contains(name)) {
          fail("the column is GENERATED; its expression's type is " +
            "pinned — drop the generated column instead")
        }
        genReferencing(name).foreach { case (g, sql) =>
          fail(s"generated column '$g' ($sql) references it; the " +
            "expression's semantics would silently change") }
        val from = sch.fields(idx).dataType
        if (!GraftCatalog.TypeWidening.widens(from, ut.newDataType)) {
          fail(s"only WIDENING promotions are metadata-only " +
            s"(tinyint→smallint→int→bigint, float→double, decimal " +
            s"growing precision-minus-scale and scale); $from does " +
            s"not widen to ${ut.newDataType} — narrowing or " +
            "re-encoding needs an explicit rewrite")
        }
        // metadata-only: the marker records the wide type; old files
        // keep their narrow encoding and every reader upcasts per
        // file (the vectorized decoder natively, the row converter
        // explicitly). New appends write the wide type.
        StructType(sch.fields.updated(idx,
          sch.fields(idx).copy(dataType = ut.newDataType)))
      case (sch, ac: TableChange.AddConstraint) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: ADD CONSTRAINT — $why")
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog
              .constraints.Check =>
            if (checks.exists(_.name.equalsIgnoreCase(c.name))) {
              fail(s"'${c.name}' already exists")
            }
            val pred = Option(c.predicateSql()).map(_.trim).getOrElse("")
            if (pred.isEmpty || pred.contains("\n")) {
              fail("the CHECK predicate must be non-empty single-line SQL")
            }
            // validate standing data BEFORE the constraint is
            // recorded: CHECK semantics — a row violates only when
            // the predicate is definitively FALSE (NULL passes)
            val spark = org.apache.spark.sql.SparkSession.active
            val violations = spark.read.format("graft-v2")
              .option("path", dir.toString).load()
              .filter(org.apache.spark.sql.functions.not(
                org.apache.spark.sql.functions.coalesce(
                  org.apache.spark.sql.functions.expr(pred),
                  org.apache.spark.sql.functions.lit(true))))
              .limit(1).count()
            if (violations > 0) {
              fail(s"'${c.name}' CHECK ($pred) is violated by " +
                "existing rows")
            }
            checks = checks :+ GraftCatalog.CheckSpec(
              c.name, c.enforced(), pred)
            sch
          case other =>
            fail(s"only CHECK constraints are supported, got $other " +
              "(PRIMARY KEY / UNIQUE / FOREIGN KEY are not " +
              "enforceable on an analytics store)")
        }
      case (sch, ud: TableChange.UpdateColumnDefaultValue) =>
        def fail(why: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft catalog: ALTER COLUMN " +
            s"${ud.fieldNames.mkString(".")} DEFAULT — $why")
        if (ud.fieldNames.length != 1) fail("must be top-level")
        val name = ud.fieldNames()(0)
        if (!sch.fieldNames.contains(name)) fail("no such column")
        val sql = Option(ud.newDefaultValue()).map(_.trim).getOrElse("")
        if (sql.isEmpty) {
          // DROP DEFAULT: future gap-filled INSERTs write NULL again;
          // the existence default (what pre-column files read) is a
          // property of history and stays
          defaults = defaults - name
        } else {
          // SET DEFAULT affects FUTURE writes only (standard
          // semantics): rows already on disk keep their values, and
          // files from before the column existed keep reading the
          // standing existence default — "NULL" when the column was
          // ALTER-ADDed (our ADD COLUMN path), the CREATE-time
          // default otherwise
          val exists = defaults.get(name).flatMap(_._2)
            .orElse(Some("NULL"))
          defaults = defaults + (name -> (sql, exists))
        }
        sch
      case (sch, sp: TableChange.SetProperty) =>
        if (GraftCatalog.ReservedProps.contains(sp.property())) {
          throw new UnsupportedOperationException(
            s"graft catalog: SET TBLPROPERTIES — '${sp.property()}' " +
            "is a reserved catalog property")
        }
        props = props + (sp.property() -> sp.value())
        sch
      case (sch, rp: TableChange.RemoveProperty) =>
        props = props - rp.property()
        sch
      case (sch, dc: TableChange.DropConstraint) =>
        val exists = checks.exists(_.name.equalsIgnoreCase(dc.name))
        if (!exists && !dc.ifExists()) {
          throw new UnsupportedOperationException(
            s"graft catalog: DROP CONSTRAINT — no constraint " +
            s"'${dc.name}' (standing: " +
            s"${checks.map(_.name).sorted.mkString(", ")})")
        }
        checks = checks.filterNot(_.name.equalsIgnoreCase(dc.name))
        sch
      case (_, other) =>
        throw new UnsupportedOperationException(
          s"graft catalog: unsupported ALTER TABLE change $other — " +
          "ADD/RENAME/DROP COLUMN, widening ALTER COLUMN TYPE, " +
          "SET/DROP DEFAULT, SET/UNSET TBLPROPERTIES and ADD/DROP " +
          "CONSTRAINT (CHECK) are the metadata-only evolutions on " +
          "immutable files")
    }
    GraftCatalog.writeMarker(fs, dir, evolved, mapping, Some(checks),
      Some(defaults), Some(props), Some(gens))
    GraftTableV2(dir.toString,
      GraftCatalog.applyDefaults(
        GraftCatalog.applyGens(evolved, gens), defaults),
      bucketSpec = graft.sources.BucketLayout.read(fs, dir),
      partitionSpec = graft.sources.PartitionLayout.read(fs, dir),
      checkConstraints = checks,
      tableProps = props)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTableDir(dir)) false else fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTableDir(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (isTableDir(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to)) {
      throw new java.io.IOException(s"rename $from -> $to failed")
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(st => isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  // ---- namespaces are plain directories ----

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(warehouse)
      .filter(st => st.isDirectory && !isTableDir(st.getPath))
      .map(st => Array(st.getPath.getName))

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir)
      .filter(st => st.isDirectory && !isTableDir(st.getPath))
      .map(st => namespace :+ st.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (namespace.nonEmpty && !fs.exists(nsDir(namespace))) {
      throw new NoSuchNamespaceException(namespace)
    }
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(nsDir(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no metadata")

  // ---- functions: just `bucket`, so Catalyst can resolve the
  // transform a bucketed table reports (storage-partitioned joins) ----

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !fs.exists(nsDir(namespace))) {
      throw new NoSuchNamespaceException(namespace)
    }
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty
  }

  /** Accepted under any namespace: Spark resolves transform functions
    * against the empty namespace, SQL users may qualify it. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) {
      graft.sources.GraftBucketFunction
    } else {
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) false
    else if (!cascade && fs.listStatus(dir).nonEmpty) {
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    } else fs.delete(dir, true)
  }
}
