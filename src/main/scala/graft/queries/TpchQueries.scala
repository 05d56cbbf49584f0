package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryUtil._

/** The remaining TPC-H analytic shapes (Q2, Q4, Q6, Q9, Q11, Q12, Q15,
  * Q16, Q19, Q20, Q21, Q22), completing the 22-query suite next to the
  * q_join_* family in BatchQueries. The fixture schema is TPC-H-ish but
  * reduced — no partsupp table, no l_commitdate/l_receiptdate/
  * l_shipmode, no p_container/p_mfgr, no c_phone — so each query keeps
  * the CANONICAL analytic shape (correlated min subquery, EXISTS /
  * NOT EXISTS, scalar-subquery threshold, disjunctive pushdown,
  * nested correlated aggregate…) with the missing column mapped to a
  * deterministic fixture equivalent, noted per query. Float discipline
  * as everywhere: exact DECIMAL sums (dsum/dsum6), one IEEE tree per
  * derived value, spelled identically in the oracle; explicit ORDER BY
  * with deterministic tiebreaks.
  *
  * Scale posture: dims broadcast (part/supplier/nation are the small
  * sides), the fact scan carries every filter (pushdown asserted by
  * PlanSpec for the family), aggregates are map-side-combinable hash
  * aggs, and the correlated shapes decorrelate to joins — the plan a
  * 1000-executor cluster wants.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** lineitem-derived supply relation standing in for partsupp:
    * (partkey, suppkey, cost = min unit price observed). */
  private def supply(t: Tables): DataFrame =
    t.lineitem.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))

  val defs: Map[String, Q] = Map(

    // Q2 minimum-cost supplier: the correlated-MIN subquery shape.
    // partsupp → the lineitem-derived supply relation; region 1 scopes
    // the supplier universe on both the outer and the correlated side.
    "q_join_q2" -> { (s, dir) =>
      val t = Tables(s, dir)
      val rs = t.supplier
        .join(broadcast(t.nation.filter(col("n_regionkey") === 1)),
          col("s_nationkey") === col("n_nationkey"))
      val ps = supply(t)
        .join(broadcast(rs.select(col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"))),
          col("l_suppkey") === col("s_suppkey"))
      val parts = broadcast(t.part
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand")))
      val cand = ps.join(parts, col("l_partkey") === col("p_partkey"))
      val minCost = cand.groupBy(col("p_partkey").as("__pk"))
        .agg(min(col("cost")).as("__minc"))
      cand.join(broadcast(minCost),
          col("p_partkey") === col("__pk") && col("cost") === col("__minc"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"),
          round(col("cost"), 6).as("supply_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q4 order-priority checking: the EXISTS semi-join shape. The
    // commit-vs-receipt lateness predicate maps to "some line shipped
    // more than 60 days after the order date".
    "q_join_q4" -> { (s, dir) =>
      val t = Tables(s, dir)
      val late = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      t.orders
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(late, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q6 forecasting-revenue change: the pure pushdown query — every
    // predicate must reach the scan; one map-combinable global sum.
    "q_join_q6" -> { (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // Q9 product-type profit: nation × year profit rollup. supplycost
    // maps to 0.5 × p_retailprice (no partsupp); 'green'-part filter
    // maps to the fixture's p_name vocabulary.
    "q_join_q9" -> { (s, dir) =>
      val t = Tables(s, dir)
      val parts = broadcast(t.part.filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_retailprice")))
      val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - lit(0.5) * col("p_retailprice") * col("l_quantity"))
      t.lineitem
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum6(amount).as("sum_profit"))
        .orderBy(col("nation"), desc("o_year"))
    },

    // Q11 important stock: the scalar-subquery threshold shape — per-
    // part supply value inside one nation, kept where it exceeds a
    // fraction of the nation's total (partsupp value → lineitem revenue
    // of that nation's suppliers).
    "q_join_q11" -> { (s, dir) =>
      val t = Tables(s, dir)
      val suppIn = broadcast(t.supplier
        .join(broadcast(t.nation.filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
      val vals = t.lineitem
        .join(suppIn, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("value"))
      val total = vals.agg(sum(col("value").cast("decimal(22,6)"))
        .cast("double").as("__total"))
      vals.crossJoin(broadcast(total))
        .filter(col("value") > col("__total") * lit(0.001))
        .select(col("l_partkey"), round(col("value"), 6).as("value"))
        .orderBy(desc("value"), col("l_partkey"))
    },

    // Q12 shipping modes & priority: the conditional-aggregation shape.
    // l_shipmode maps to l_linestatus; the commit/receipt window maps
    // to "shipped within 90 days of ordering", receipt year 1997.
    "q_join_q12" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAYS") &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Q15 top supplier: the view + scalar-MAX shape — quarterly revenue
    // per supplier, keep the argmax rows exactly.
    "q_join_q15" -> { (s, dir) =>
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("__max"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("__max"))
        .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 6).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Q16 parts/supplier relationship: the NOT-IN-subquery shape. The
    // complaints pattern maps to negative-balance suppliers; partsupp
    // maps to the distinct (part, supplier) pairs lineitem witnessed.
    "q_join_q16" -> { (s, dir) =>
      val t = Tables(s, dir)
      val pairs = t.lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      val badSupp = broadcast(t.supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")))
      val parts = broadcast(t.part
        .filter(col("p_brand") =!= "Brand#4" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 5, 9, 12, 15, 20, 25, 30))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
      pairs
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q19 discounted revenue: the disjunctive-predicate shape — three
    // OR-branches over (brand, size, quantity) bands (container → size
    // bands), one global revenue sum. The join stays an equi-join on
    // partkey; the disjunction filters rows, never multiplies them.
    "q_join_q19" -> { (s, dir) =>
      val t = Tables(s, dir)
      val j = t.lineitem.join(broadcast(t.part.select(col("p_partkey"),
          col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      val branch1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 15)
      val branch2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(1, 20) && col("l_quantity").between(5, 25)
      val branch3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 30) && col("l_quantity").between(10, 40)
      j.filter(branch1 || branch2 || branch3)
        .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_rows"))
    },

    // Q20 potential part promotion: the nested correlated-aggregate
    // shape — suppliers whose 1997 shipments of a 'small' part exceed
    // 20% of their all-time volume of that part (availqty → all-time
    // volume), surfaced through a semi-join.
    "q_join_q20" -> { (s, dir) =>
      val t = Tables(s, dir)
      val smallParts = broadcast(t.part
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey")))
      val perPair = t.lineitem
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("__qall"),
          dsum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            col("l_quantity")).otherwise(lit(0.0))).as("__q97"))
        .filter(col("__q97") > col("__qall") * lit(0.2))
      t.supplier
        .join(perPair.select(col("l_suppkey")).distinct(),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },

    // Q21 suppliers who kept orders waiting: the EXISTS + NOT EXISTS
    // composition. "Late" maps to shipped >60 days after the order
    // date; the multi-supplier order structure is real in the fixture.
    "q_join_q21" -> { (s, dir) =>
      val t = Tables(s, dir)
      val lines = t.lineitem
        .join(t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("__late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      // per (order, supplier): did THIS supplier ship late here?
      val perOs = lines.groupBy(col("l_orderkey").as("__ok"),
          col("l_suppkey").as("__sk"))
        .agg(max(col("__late")).as("__anylate"))
      val late = perOs.filter(col("__anylate"))
      // EXISTS another supplier in the order (late or not)
      val others = perOs.select(col("__ok").as("__ok2"), col("__sk").as("__sk2"))
      val withOther = late.join(others,
        col("__ok") === col("__ok2") && col("__sk") =!= col("__sk2"),
        "left_semi")
      // NOT EXISTS another LATE supplier in the order
      val lateOthers = late.select(col("__ok").as("__ok3"), col("__sk").as("__sk3"))
      val sole = withOther.join(lateOthers,
        col("__ok") === col("__ok3") && col("__sk") =!= col("__sk3"),
        "left_anti")
      sole.join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
          col("__sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(100)
    },

    // Q22 global sales opportunity: the anti-join + scalar-subquery
    // shape. The phone country code maps to c_nationkey mod 7.
    "q_join_q22" -> { (s, dir) =>
      val t = Tables(s, dir)
      val coded = t.customer
        .withColumn("cntrycode", pmod(col("c_nationkey"), lit(7)).cast("long"))
        .filter(col("cntrycode").isin(1L, 2L, 4L))
      val avgBal = coded.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
          / count(lit(1))).as("__avg"))
      coded.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(t.orders
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
  )

  val oracles: Map[String, String] = Map(

    "q_join_q2" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS cost
           FROM lineitem GROUP BY 1, 2),
         rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           WHERE n_regionkey = 1),
         pp AS (SELECT p_partkey, p_brand FROM part
           WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
         cand AS (SELECT rs.*, ps.l_partkey, ps.cost, pp.p_partkey, pp.p_brand
           FROM ps JOIN rs ON ps.l_suppkey = rs.s_suppkey
           JOIN pp ON ps.l_partkey = pp.p_partkey),
         mc AS (SELECT p_partkey AS pk, min(cost) AS minc
           FROM cand GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           round(cost, 6) AS supply_cost
         FROM cand JOIN mc ON cand.p_partkey = mc.pk AND cand.cost = mc.minc
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",

    "q_join_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_join_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
             AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q_join_q9" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             - 0.5 * p_retailprice * l_quantity AS DECIMAL(22,6)))
             AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    "q_join_q11" ->
      """WITH si AS (SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_3'),
         v AS (SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(22,6))) AS DOUBLE) AS value
           FROM lineitem JOIN si ON l_suppkey = s_suppkey
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE)
             AS total FROM v)
         SELECT l_partkey, round(value, 6) AS value
         FROM v, tot WHERE value > total * 0.001
         ORDER BY value DESC, l_partkey""",

    "q_join_q12" ->
      """SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= o_orderdate
           AND l_shipdate < o_orderdate + INTERVAL 90 DAY
           AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q_join_q15" ->
      """WITH rev AS (SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(22,6))) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY 1),
         mx AS (SELECT max(total_revenue) AS m FROM rev)
         SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue
         FROM rev, mx, supplier
         WHERE total_revenue = mx.m AND l_suppkey = s_suppkey
         ORDER BY s_suppkey""",

    "q_join_q16" ->
      """SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'PROMO%'
           AND p_size IN (1, 5, 9, 12, 15, 20, 25, 30)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q_join_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                AND l_quantity BETWEEN 5 AND 25)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                AND l_quantity BETWEEN 10 AND 40)""",

    "q_join_q20" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
         pp AS (SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qall,
             CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
               THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS q97
           FROM lineitem JOIN sp ON l_partkey = p_partkey
           GROUP BY l_suppkey, l_partkey)
         SELECT s_name, s_acctbal
         FROM supplier
         WHERE s_suppkey IN (SELECT l_suppkey FROM pp WHERE q97 > qall * 0.2)
         ORDER BY s_name""",

    "q_join_q21" ->
      """WITH lo AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         pos AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
               THEN 1 ELSE 0 END) AS anylate
           FROM lo GROUP BY 1, 2),
         late AS (SELECT * FROM pos WHERE anylate = 1),
         cand AS (SELECT late.ok, late.sk FROM late
           WHERE EXISTS (SELECT 1 FROM pos o2
               WHERE o2.ok = late.ok AND o2.sk <> late.sk)
             AND NOT EXISTS (SELECT 1 FROM late l3
               WHERE l3.ok = late.ok AND l3.sk <> late.sk))
         SELECT s_name, count(*) AS numwait
         FROM cand JOIN supplier ON sk = s_suppkey
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",

    "q_join_q22" ->
      """WITH coded AS (SELECT c_custkey, c_acctbal,
             CAST(c_nationkey % 7 AS BIGINT) AS cntrycode
           FROM customer WHERE c_nationkey % 7 IN (1, 2, 4)),
         a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             / count(*) AS avg_bal
           FROM coded WHERE c_acctbal > 0)
         SELECT cntrycode, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
         FROM coded, a
         WHERE c_acctbal > a.avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY cntrycode ORDER BY cntrycode""",
  )
}
