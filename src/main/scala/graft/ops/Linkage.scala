package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Components

/** Multi-key record linkage (entity resolution): the identity-dedup a
  * training-data pipeline runs over user/account/author records before
  * any per-entity aggregation — the record-level sibling of the
  * document dedup ladder (cf. the reference's user-keyed aggregates,
  * Real-Time-CDC-Analytics-Pipeline-with-ClickHouse flink job, which
  * assume resolved user ids).
  *
  * Shape: BLOCK on each key independently (records sharing a non-null
  * key value in a block of tolerable size become candidate pairs),
  * UNION the per-key edge sets, then transitively close with
  * [[Components.connectedComponents]] — A and C merge when A shares a
  * phone with B and B shares an email with C, even though A and C
  * share nothing. One record per entity is elected canonical (min
  * rec_id — the components label itself, so no second election pass).
  *
  * Scale: per key, one hash aggregate for block sizes + one
  * self-join keyed on the block value — pair volume is Σ block², which
  * `maxBlock` bounds (an over-sized block is a junk key — a default
  * phone, an empty email — and linking through it is wrong anyway;
  * standard ER practice drops them). Block tables are corpus-derived →
  * [[Joins.corpusSide]] pins. Components is the measured
  * log-round min-label propagation (SCALE.md dup_components rung).
  */
object Linkage {

  /** Resolve entities over `records`. `keys` are blocking-key columns
    * (null = missing, never links). Output: (rec_id, entity,
    * cluster_size, canonical) — entity is the min rec_id of the
    * cluster; every input record appears (singletons are their own
    * entity). */
  def resolve(records: DataFrame, id: Column, keys: Seq[Column],
      maxBlock: Long = 50L, maxIter: Int = 25): DataFrame = {
    require(keys.nonEmpty && maxBlock >= 2)
    val edges = keys.map { k =>
      val b = records.select(id.as("rec_id"), k.as("bk"))
        .filter(col("bk").isNotNull)
      val ok = b.groupBy(col("bk")).agg(count(lit(1)).as("__bc"))
        .filter(col("__bc") <= maxBlock).select(col("bk"))
      val blocked = b.join(Joins.corpusSide(ok), Seq("bk"))
      blocked.as("a")
        .join(Joins.corpusSide(blocked.as("b")),
          col("a.bk") === col("b.bk") && col("a.rec_id") < col("b.rec_id"))
        .select(col("a.rec_id").as("src"), col("b.rec_id").as("dst"))
    }.reduce(_ unionAll _)
    val comps = Components.connectedComponents(edges, col("src"), col("dst"),
      records.select(id.as("__nid")), col("__nid"), maxIter)
    val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    comps.join(Joins.corpusSide(sizes), Seq("comp"))
      .select(col("id").as("rec_id"), col("comp").as("entity"),
        col("cluster_size"), (col("id") === col("comp")).as("canonical"))
  }

  /** The deterministic records fixture over TPC-H `customer` both
    * engines build: every customer yields a base record; every third a
    * re-registration sharing the PHONE (new email); every fifth a
    * second account sharing the EMAIL (no phone). A customer divisible
    * by 15 therefore resolves to a 3-record entity only via the
    * transitive phone→email closure. */
  def customerRecords(customer: DataFrame): DataFrame = {
    val phone = concat(lit("p"), col("c_custkey").cast("string"))
    val base = customer.select((col("c_custkey") * 4).as("rec_id"),
      phone.as("phone"), md5(col("c_name")).as("email"))
    val rePhone = customer.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") * 4 + 1).as("rec_id"),
        phone.as("phone"), md5(concat(col("c_name"), lit("x"))).as("email"))
    val reEmail = customer.filter(col("c_custkey") % 5 === 0)
      .select((col("c_custkey") * 4 + 2).as("rec_id"),
        lit(null).cast("string").as("phone"), md5(col("c_name")).as("email"))
    base.unionAll(rePhone).unionAll(reEmail)
  }

  /** DuckDB replica of `resolve(customerRecords(customer),
    * keys = phone/email)`: same fixture CTE, per-key blocked pairs
    * under the same size cap, recursive min-label closure. */
  def customerResolveOracleSql(maxBlock: Long = 50L): String =
    s"""WITH RECURSIVE recs AS (
  SELECT c_custkey*4 AS rec_id, 'p' || CAST(c_custkey AS VARCHAR) AS phone, md5(c_name) AS email FROM customer
  UNION ALL SELECT c_custkey*4+1, 'p' || CAST(c_custkey AS VARCHAR), md5(c_name || 'x') FROM customer WHERE c_custkey % 3 = 0
  UNION ALL SELECT c_custkey*4+2, NULL, md5(c_name) FROM customer WHERE c_custkey % 5 = 0),
pe AS (SELECT a.rec_id AS src, b.rec_id AS dst FROM recs a JOIN recs b ON a.phone = b.phone AND a.rec_id < b.rec_id
       WHERE a.phone IN (SELECT phone FROM recs WHERE phone IS NOT NULL GROUP BY phone HAVING count(*) <= $maxBlock)),
ee AS (SELECT a.rec_id AS src, b.rec_id AS dst FROM recs a JOIN recs b ON a.email = b.email AND a.rec_id < b.rec_id
       WHERE a.email IN (SELECT email FROM recs WHERE email IS NOT NULL GROUP BY email HAVING count(*) <= $maxBlock)),
und AS (SELECT src, dst FROM pe UNION ALL SELECT dst, src FROM pe
        UNION ALL SELECT src, dst FROM ee UNION ALL SELECT dst, src FROM ee),
reach AS (
  SELECT rec_id AS node, rec_id AS lbl FROM recs
  UNION
  SELECT und.dst AS node, reach.lbl FROM reach JOIN und ON und.src = reach.node
),
comp AS (SELECT node AS rec_id, min(lbl) AS entity FROM reach GROUP BY node),
sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY entity)
SELECT comp.rec_id, comp.entity, sz.cluster_size, comp.rec_id = comp.entity AS canonical
FROM comp JOIN sz USING (entity)"""
}
