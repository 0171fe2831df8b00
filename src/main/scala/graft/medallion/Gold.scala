package graft.medallion

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold layer: star-schema dimension + fact builders.
  *
  * Reproduces reference gold semantics (reference:
  * data_lakehouse/etl_scripts/gold_layer/gold_transformation.py):
  *  - dim_customers: projected + initcap-normalized city/country,
  *    non-null-PK filter (gold_transformation.py:38-52)
  *  - dim_products: lower(category), price>0 filter
  *    (gold_transformation.py:66-78)
  *  - fact_sales: orders ⋈ dim_customers ⋈ dim_products, derived
  *    total = price*quantity, DQ filters on PK/quantity/value
  *    (gold_transformation.py:90-160)
  *
  * Scale: dimension tables are orders of magnitude smaller than the
  * fact — both joins are `broadcast()` so the fact side streams
  * through map-side hash joins with ZERO shuffle. At 100 TB of fact
  * data that is the difference between a pipeline and a bottleneck.
  */
object Gold {

  /** Generic dimension builder: project/rename, normalize selected
    * string columns, drop null-PK rows.
    *
    * @param normalized map target-name -> normalizing Column
    */
  def dimension(src: DataFrame, pk: String,
                projected: Seq[(String, String)],
                normalized: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val cols = projected.map { case (from, to) =>
      normalized.getOrElse(to, col(from)).as(to)
    }
    src.select(cols: _*).filter(col(pk).isNotNull)
  }

  /** Fact builder: broadcast-join the fact source to each dimension,
    * add derived measure, apply DQ filters. Dimensions are joined
    * with `broadcast` hints — shuffle-free on the fact side. */
  def fact(factSrc: DataFrame,
           dims: Seq[(DataFrame, org.apache.spark.sql.Column)],
           select: Seq[org.apache.spark.sql.Column],
           filters: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val joined = dims.foldLeft(factSrc) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, "inner")
    }
    filters.foldLeft(joined.select(select: _*))((df, f) => df.filter(f))
  }
}
