package graft.olhovivo

import org.apache.spark.sql.types._

/** Explicit, fixed schemas for the Olho Vivo pipeline relations
  * (SURVEY.md §1.2). The reference infers dtypes from Python dicts
  * (etl-olho-vivo-ingestao-posicoes.py:68) — here every relation has one
  * declared StructType used with `spark.read.schema(...)`, so missing API
  * fields surface as typed nulls instead of silent type drift.
  */
object Schemas {

  /** One vehicle inside a line's `vs` list (wire names; reference
    * ingestao-posicoes.py:56–60). */
  val rawVehicle: StructType = StructType(Seq(
    StructField("p", StringType),    // prefixo_veiculo
    StructField("a", BooleanType),   // acessibilidade
    StructField("ta", StringType),   // ISO-8601 UTC instant
    StructField("py", DoubleType),   // latitude
    StructField("px", DoubleType)))  // longitude

  /** One bus line inside the snapshot's `l` list (ingestao:48,51–55). */
  val rawLine: StructType = StructType(Seq(
    StructField("c", StringType),     // letreiro
    StructField("cl", IntegerType),   // codigo_linha
    StructField("sl", IntegerType),   // sentido_linha (1|2)
    StructField("lt0", StringType),   // destino_linha
    StructField("lt1", StringType),   // origem_linha
    StructField("vs", ArrayType(rawVehicle))))

  /** A raw API snapshot document (one JSON file per poll;
    * get-bus-data.py:26–49). `_corrupt_record` captures per-file parse
    * failures so one bad poll never kills the day (reference F2,
    * ingestao:41–65). */
  val rawSnapshot: StructType = StructType(Seq(
    StructField("hr", StringType),
    StructField("l", ArrayType(rawLine)),
    StructField("_corrupt_record", StringType)))

  /** The flat positions table (T1 output = T2 input; SURVEY.md §1.2,
    * data-dictionary PDF page 1). */
  val posicoes: StructType = StructType(Seq(
    StructField("letreiro", StringType),
    StructField("codigo_linha", IntegerType),
    StructField("sentido_linha", IntegerType),
    StructField("destino_linha", StringType),
    StructField("origem_linha", StringType),
    StructField("prefixo_veiculo", StringType),
    StructField("acessibilidade", BooleanType),
    StructField("timestamp", LongType),   // Unix seconds, UTC
    StructField("py", DoubleType),        // latitude
    StructField("px", DoubleType)))       // longitude

  case class Posicao(
      letreiro: String, codigo_linha: Option[Int], sentido_linha: Option[Int],
      destino_linha: String, origem_linha: String, prefixo_veiculo: String,
      acessibilidade: Option[Boolean], timestamp: Option[Long],
      py: Option[Double], px: Option[Double])
}
