package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL dump export — the reference's `dumpsql` (DDL + INSERT statements,
  * `/root/reference/dbcut/cli/cmd_dumpsql.py`), re-expressed distributed:
  * the INSERT statements are rendered as a string column *on the executors*
  * (pure Column expressions, codegen'd — no driver-side row loop) and
  * written as a text file; only the DDL header is built on the driver from
  * the schema.
  *
  * Cross-DBMS fidelity mirrors the reference's SQLAlchemy dialect layer
  * (`database.py:267-305` per-dialect FK toggles, `sqlalchemy_utils.py`
  * type rendering): a [[Dialect]] picks type names, identifier quoting,
  * boolean/binary literal syntax, autoincrement PK rendering, and the
  * FK-checks-off prologue the reference wraps loads in
  * (`no_fkc_session`, `database.py:283-310`).
  */
object SqlDump {

  /** Target-DBMS rendering rules. `Ansi` is the portable default. */
  sealed trait Dialect {
    def name: String
    def quote(ident: String): String = "\"" + ident + "\""
    def sqlType(dt: DataType): String = dt match {
      case ByteType | ShortType => "SMALLINT"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case FloatType => "REAL"
      case DoubleType => "DOUBLE PRECISION"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BLOB"
      case _ => "TEXT"
    }
    /** Single-PK integer column rendered as auto-increment. */
    def autoIncrementSuffix: String = ""
    /** Lines emitted before/after the INSERTs (FK checks off/on). */
    def prologue(tables: Seq[String]): Seq[String] = Nil
    def epilogue(tables: Seq[String]): Seq[String] = Nil
    def boolLiteral(c: Column): Column = when(c, "TRUE").otherwise("FALSE")
    def binaryLiteral(c: Column): Column =
      concat(lit("X'"), upper(hex(c)), lit("'"))
  }

  case object Ansi extends Dialect {
    val name = "ansi"
    // bare identifiers: the portable dump stays loadable (and diffable)
    // everywhere without quote-style commitments
    override def quote(ident: String): String = ident
  }

  case object MySql extends Dialect {
    val name = "mysql"
    override def quote(ident: String): String = s"`$ident`"
    override def sqlType(dt: DataType): String = dt match {
      case DoubleType => "DOUBLE"
      case BooleanType => "TINYINT(1)"
      // TIMESTAMP in MySQL is range-limited + zone-shifted; DATETIME(6)
      // matches Spark's microsecond timestamps
      case TimestampType | TimestampNTZType => "DATETIME(6)"
      case StringType => "LONGTEXT"
      case BinaryType => "LONGBLOB"
      case other => super.sqlType(other)
    }
    override def autoIncrementSuffix: String = " AUTO_INCREMENT"
    override def prologue(tables: Seq[String]): Seq[String] =
      Seq("SET FOREIGN_KEY_CHECKS = 0;")
    override def epilogue(tables: Seq[String]): Seq[String] =
      Seq("SET FOREIGN_KEY_CHECKS = 1;")
    override def boolLiteral(c: Column): Column = when(c, "1").otherwise("0")
  }

  case object Postgres extends Dialect {
    val name = "postgresql"
    override def sqlType(dt: DataType): String = dt match {
      case BinaryType => "BYTEA"
      case other => super.sqlType(other)
    }
    // the reference re-creates sequences via SQLAlchemy; SERIAL is the
    // dump-file equivalent
    override def autoIncrementSuffix: String = "" // rendered via type below
    override def prologue(tables: Seq[String]): Seq[String] =
      tables.map(t => s"ALTER TABLE IF EXISTS ${quote(t)} DISABLE TRIGGER ALL;")
    override def epilogue(tables: Seq[String]): Seq[String] =
      tables.map(t => s"ALTER TABLE IF EXISTS ${quote(t)} ENABLE TRIGGER ALL;")
    override def binaryLiteral(c: Column): Column =
      concat(lit("'\\x"), upper(hex(c)), lit("'"))
  }

  case object Sqlite extends Dialect {
    val name = "sqlite"
    override def sqlType(dt: DataType): String = dt match {
      // SQLite type affinity: INTEGER / REAL / TEXT / BLOB
      case ByteType | ShortType | IntegerType | LongType | BooleanType => "INTEGER"
      case FloatType | DoubleType => "REAL"
      case _: DecimalType => "NUMERIC"
      case BinaryType => "BLOB"
      case _ => "TEXT"
    }
    override def prologue(tables: Seq[String]): Seq[String] =
      Seq("PRAGMA foreign_keys = OFF;")
    override def epilogue(tables: Seq[String]): Seq[String] =
      Seq("PRAGMA foreign_keys = ON;")
    override def boolLiteral(c: Column): Column = when(c, "1").otherwise("0")
  }

  val dialects: Map[String, Dialect] =
    Seq(Ansi, MySql, Postgres, Sqlite).map(d => d.name -> d).toMap

  /** A foreign-key clause for the DDL: childCols REFERENCES parent(parentCols). */
  final case class FkClause(childCols: Seq[String], parent: String, parentCols: Seq[String])

  /** Portable type name (ANSI dialect) — kept for callers/tests. */
  def sqlType(dt: DataType): String = Ansi.sqlType(dt)

  /** CREATE TABLE statement for a DataFrame's schema, with PK, FK clauses,
    * and dialect-specific types/quoting. A single integer PK column gets
    * the dialect's auto-increment rendering (Postgres: SERIAL types).
    */
  def ddl(table: String, df: DataFrame, pk: Seq[String] = Nil,
          fks: Seq[FkClause] = Nil, dialect: Dialect = Ansi): String = {
    val singleIntPk = pk match {
      case Seq(one) => df.schema.fields.find(_.name == one).map(_.dataType) match {
        case Some(IntegerType | LongType) => Some(one)
        case _ => None
      }
      case _ => None
    }
    val cols = df.schema.fields.map { f =>
      val notNull = if (f.nullable) "" else " NOT NULL"
      val tpe = (dialect, singleIntPk.contains(f.name), f.dataType) match {
        // Postgres spells auto-increment as a type, not a suffix
        case (Postgres, true, IntegerType) => "SERIAL"
        case (Postgres, true, LongType) => "BIGSERIAL"
        case (d, true, t) => d.sqlType(t) + d.autoIncrementSuffix
        case (d, false, t) => d.sqlType(t)
      }
      s"  ${dialect.quote(f.name)} $tpe$notNull"
    }
    val pkLine =
      if (pk.nonEmpty) Seq(s"  PRIMARY KEY (${pk.map(dialect.quote).mkString(", ")})")
      else Nil
    val fkLines = fks.map(fk =>
      s"  FOREIGN KEY (${fk.childCols.map(dialect.quote).mkString(", ")}) " +
        s"REFERENCES ${dialect.quote(fk.parent)} (${fk.parentCols.map(dialect.quote).mkString(", ")})")
    (s"CREATE TABLE ${dialect.quote(table)} (" +:
      (cols ++ pkLine ++ fkLines).mkString(",\n") +: Seq(");"))
      .mkString("\n")
  }

  /** SQL literal rendering of one column, as a Column expression. */
  def literal(f: StructField, dialect: Dialect = Ansi): Column = {
    val c = col(f.name)
    val rendered: Column = f.dataType match {
      case StringType =>
        concat(lit("'"), regexp_replace(c, "'", "''"), lit("'"))
      case DateType =>
        concat(lit("'"), c.cast("string"), lit("'"))
      case TimestampType | TimestampNTZType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("'"))
      case BinaryType => dialect.binaryLiteral(c)
      case BooleanType => dialect.boolLiteral(c)
      case _ => c.cast("string")
    }
    when(c.isNull, lit("NULL")).otherwise(rendered)
  }

  /** DataFrame of one `INSERT INTO t (cols) VALUES (...);` string per row. */
  def insertStatements(table: String, df: DataFrame,
                       dialect: Dialect = Ansi): DataFrame = {
    val colList = df.schema.fieldNames.map(dialect.quote).mkString(", ")
    val values = df.schema.fields.map(literal(_, dialect))
    val parts: Seq[Column] =
      lit(s"INSERT INTO ${dialect.quote(table)} ($colList) VALUES (") +:
        values.zipWithIndex.flatMap { case (v, i) =>
          if (i == 0) Seq(v) else Seq(lit(", "), v)
        }.toSeq :+ lit(");")
    df.select(concat(parts: _*).as("stmt"))
  }

  /** Full dump of one table to a text file: dialect prologue (FK checks
    * off — the reference inserts inside `no_fkc_session`), DDL header,
    * distributed INSERTs, epilogue. `orderBy` keeps output deterministic
    * for diffing/tests.
    */
  def dump(table: String, df: DataFrame, destPath: String,
           pk: Seq[String] = Nil, fks: Seq[FkClause] = Nil,
           dialect: Dialect = Ansi): Unit = {
    import org.apache.spark.sql.SaveMode
    val spark = df.sparkSession
    import spark.implicits._
    // ord pins section order through the global sort: 0 prologue, 1 DDL,
    // 2 INSERTs (deterministic within), 3 epilogue
    val header =
      dialect.prologue(Seq(table)).map((_, 0)) ++
        Seq((ddl(table, df, pk, fks, dialect), 1)) ++
        dialect.epilogue(Seq(table)).map((_, 3))
    header.toDF("stmt", "ord")
      .unionByName(insertStatements(table, df, dialect).withColumn("ord", lit(2)))
      .orderBy("ord", "stmt").select("stmt")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).text(destPath)
  }
}
