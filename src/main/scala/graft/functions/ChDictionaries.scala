package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateMap, Expression, Literal}
import org.apache.spark.sql.types.DataType

/** External-dictionary surface (reference: src/Parsers/ASTDictionary.h:1
  * + ASTDictionaryAttributeDeclaration.h): ClickHouse users lean on
  * `dictGet('dict', 'attr', key)` for dimension lookups inside any
  * expression. The Spark analog of a CH dictionary is a broadcast map:
  * `register` collects the DIMENSION-SIZED key→attr pairs to the
  * driver (the same size contract as a broadcast-hash-join build side
  * — never fact data; CH itself holds the whole dictionary in every
  * server's memory), and dictGet embeds them as a map literal in the
  * plan — a codegen'd ElementAt per row, no join, no shuffle.
  *
  * Missing keys return NULL (= CH's dictGetOrNull; CH's plain dictGet
  * substitutes the attribute's type default — coalesce at the call
  * site for that behavior).
  */
object ChDictionaries {

  private val maps =
    scala.collection.concurrent.TrieMap[(String, String), (Seq[Expression], DataType)]()

  /** Registered dictionary names (system.dictionaries). */
  private[functions] def registeredNames: Seq[String] =
    maps.keys.map(_._1).toSeq.distinct.sorted

  /** Register `dim`'s key→attr pairs under `name`. Collect is
    * dictionary-sized by contract. */
  def register(name: String, dim: DataFrame, keyCol: String, attrCols: Seq[String]): Unit = {
    val keyType = dim.schema(keyCol).dataType
    val rows = dim.select(keyCol, attrCols: _*).collect()
    attrCols.zipWithIndex.foreach { case (a, ai) =>
      val vType = dim.schema(a).dataType
      val entries = rows.toSeq.flatMap { r =>
        Seq(Literal.create(r.get(0), keyType), Literal.create(r.get(ai + 1), vType))
      }
      maps.put((name, a), (entries, keyType))
    }
  }

  /** Build the lookup expression for dictGet('dict', 'attr', key). */
  private[functions] def lookupExpr(dict: String, attr: String, key: Expression): Expression = {
    val (entries, keyType) = maps.getOrElse((dict, attr),
      throw new IllegalArgumentException(
        s"dictionary '$dict' attribute '$attr' not registered — call ChDictionaries.register"))
    org.apache.spark.sql.catalyst.expressions.ElementAt(
      CreateMap(entries), Cast(key, keyType))
  }

  /** Build the membership probe for dictHas('dict', key) — true iff
    * the key exists in the dictionary (probed against the first
    * registered attribute's map; all attributes share the key set). */
  private[functions] def hasExpr(dict: String, key: Expression): Expression = {
    val attr = maps.keys.collect { case (d, a) if d == dict => a }.toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        s"dictionary '$dict' not registered — call ChDictionaries.register"))
    val (entries, keyType) = maps((dict, attr))
    org.apache.spark.sql.catalyst.expressions.ArrayContains(
      org.apache.spark.sql.catalyst.expressions.MapKeys(CreateMap(entries)),
      Cast(key, keyType))
  }

  private[functions] def literalString(e: Expression, what: String): String = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"dictGet $what must be a string literal, got $other")
  }
}
