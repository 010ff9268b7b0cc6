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
  */
object SqlDump {

  /** Map a Spark type to a portable SQL type (ANSI-ish, MySQL/Postgres/
    * SQLite compatible subset — mirrors dbcut's cross-DBMS posture).
    */
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

  /** CREATE TABLE statement for a DataFrame's schema. */
  def ddl(table: String, df: DataFrame, pk: Seq[String] = Nil): String = {
    val cols = df.schema.fields.map { f =>
      val notNull = if (f.nullable) "" else " NOT NULL"
      s"  ${f.name} ${sqlType(f.dataType)}$notNull"
    }
    val pkLine = if (pk.nonEmpty) Seq(s"  PRIMARY KEY (${pk.mkString(", ")})") else Nil
    (s"CREATE TABLE $table (" +: (cols ++ pkLine).mkString(",\n") +: Seq(");"))
      .mkString("\n")
  }

  /** SQL literal rendering of one column, as a Column expression. */
  def literal(f: StructField): Column = {
    val c = col(f.name)
    val rendered: Column = f.dataType match {
      case StringType =>
        concat(lit("'"), regexp_replace(c, "'", "''"), lit("'"))
      case DateType =>
        concat(lit("'"), c.cast("string"), lit("'"))
      case TimestampType | TimestampNTZType =>
        concat(lit("'"), date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("'"))
      case BinaryType =>
        concat(lit("X'"), upper(hex(c)), lit("'"))
      case BooleanType =>
        when(c, "TRUE").otherwise("FALSE")
      case _ => c.cast("string")
    }
    when(c.isNull, lit("NULL")).otherwise(rendered)
  }

  /** DataFrame of one `INSERT INTO t (cols) VALUES (...);` string per row. */
  def insertStatements(table: String, df: DataFrame): DataFrame = {
    val colList = df.schema.fieldNames.mkString(", ")
    val values = df.schema.fields.map(literal)
    val parts: Seq[Column] =
      lit(s"INSERT INTO $table ($colList) VALUES (") +:
        values.zipWithIndex.flatMap { case (v, i) =>
          if (i == 0) Seq(v) else Seq(lit(", "), v)
        }.toSeq :+ lit(");")
    df.select(concat(parts: _*).as("stmt"))
  }

  /** Full dump of one table to a text file: DDL header + distributed
    * INSERTs. `orderBy` keeps output deterministic for diffing/tests.
    */
  def dump(table: String, df: DataFrame, destPath: String,
           pk: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.SaveMode
    val header = Seq(ddl(table, df, pk))
    val spark = df.sparkSession
    import spark.implicits._
    // union does not guarantee partition order through coalesce; a global
    // sort on (ord, stmt) pins the DDL first and the INSERTs deterministic
    header.toDF("stmt").withColumn("ord", lit(0))
      .unionByName(insertStatements(table, df).withColumn("ord", lit(1)))
      .orderBy("ord", "stmt").select("stmt")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).text(destPath)
  }
}
