package graft

/** Qualified table name (catalog.schema.table) with the reference's
  * parsing contract — fugue_trino/collections.py:5-49 `TableName`, whose
  * behavior is pinned by tests/fugue_trino/test_collections.py: parts are
  * trimmed; missing leading parts fill from defaults; an empty table name
  * falls back to `tableFunc`; anything still missing is an error.
  *
  * Bridges to [[Warehouse]]: `toString` ("a.b.c") is exactly the
  * qualified form `loadTable`/`saveTable` resolve to nested directories.
  */
final case class TableName(catalog: String, schema: String, table: String) {
  override def toString: String = s"$catalog.$schema.$table"
}

object TableName {

  def parse(
      raw: String,
      defaultCatalog: Option[String] = None,
      defaultSchema: Option[String] = None,
      tableFunc: Option[() => String] = None
  ): TableName = {
    val s = Option(raw).getOrElse("")
    fromParts(s.trim.split("\\.", -1).toSeq.map(_.trim),
      defaultCatalog, defaultSchema, tableFunc)
  }

  /** Parse from pre-split parts (the tuple/list form of the reference) —
    * trimmed like the string form, so both overloads agree and toString
    * always round-trips.
    */
  def parse(parts: Seq[String]): TableName =
    fromParts(parts.map(p => Option(p).map(_.trim).getOrElse("")), None, None, None)

  /** Idempotent on an already-parsed name. */
  def parse(t: TableName): TableName = t

  private def fromParts(
      parts: Seq[String],
      defaultCatalog: Option[String],
      defaultSchema: Option[String],
      tableFunc: Option[() => String]
  ): TableName = {
    val (cat, sch, tbl0) = parts match {
      case Seq(t)       => (defaultCatalog.getOrElse(""), defaultSchema.getOrElse(""), t)
      case Seq(s, t)    => (defaultCatalog.getOrElse(""), s, t)
      case Seq(c, s, t) => (c, s, t)
      case other =>
        throw new IllegalArgumentException(
          s"'${other.mkString(".")}' can't be parsed into a table name")
    }
    val tbl = if (tbl0.isEmpty) tableFunc.map(_.apply()).getOrElse(tbl0) else tbl0
    if (cat.isEmpty) throw new IllegalArgumentException("catalog is not provided")
    if (sch.isEmpty) throw new IllegalArgumentException("schema is not provided")
    if (tbl == null || tbl.isEmpty)
      throw new IllegalArgumentException("table name is not provided")
    TableName(cat, sch, tbl)
  }
}
