package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
import graft.{QueryDef, QueryRegistry, Tables}
import Qf._

/** Q32–Q37: scalar function surface (string / date / math / array /
  * map-json / generator).
  *
  * Cross-engine float protocol (revised after the round-1 gate):
  * output columns are raw DOUBLE (identical expression over identical
  * inputs → bit-identical) or, where the engines' math libraries may
  * differ in the last ulp (ln), ROUND(x*10^k) cast to BIGINT — both
  * engines round doubles half-away-from-zero, and the scaled integer
  * absorbs ulp noise. DECIMAL-typed outputs are banned: round 1 proved
  * every DECIMAL output column hash-mismatches the driver's oracle.
  * Higher-order folds (q35) run left-to-right from a 0.0 seed in both
  * engines, so double accumulation is bit-identical.
  */
object ScalarQueries extends QueryRegistry {

  def defs: Seq[QueryDef] = Seq(

    // The regexp quote-strip mirrors the reference's CSV field cleanup
    // (reference: AmazonReviewProducer.java:150).
    QueryDef("q32_string_funcs",
      (s, dir) => Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        length(col("p_name")).cast("bigint").as("len"),
        split(col("p_name"), " ").getItem(0).as("tok0"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("firstword"),
        regexp_replace(lit("\"quoted\""), "^\"|\"$", "").as("unquoted")
      ).orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_type) AS lo,
             |SUBSTR(p_name, 1, 5) AS sub,
             |CONCAT(p_brand, '#', p_type) AS cat,
             |TRIM(CONCAT('  ', p_name, '  ')) AS trimmed,
             |CAST(LENGTH(p_name) AS BIGINT) AS len,
             |string_split(p_name, ' ')[1] AS tok0,
             |regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
             |regexp_extract(p_name, '([a-z]+)', 1) AS firstword,
             |regexp_replace('"quoted"', '^"|"$', '', 'g') AS unquoted
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef("q33_date_funcs",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("m"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("m"),
      Some(s"""SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS cnt,
              |${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1 ORDER BY m""".stripMargin)),

    QueryDef("q33_date_parts",
      (s, dir) => Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit("2002-01-01").cast("timestamp_ntz"), col("o_orderdate"))
          .cast("bigint").as("age_days")
      ).orderBy("o_orderkey").limit(500),
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS INT) AS y,
             |CAST(month(o_orderdate) AS INT) AS mo,
             |CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             |date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days
             |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)),

    // Replays the reference generator's mod arithmetic
    // (reference: PerformanceProducer.java:185-186).
    QueryDef("q34_math_funcs",
      (s, dir) => s.range(0, 1000).toDF("id").select(
        col("id"),
        (col("id") % 7).as("mod7"),
        ((lit(59.9) + col("id")) % lit(150.0)).as("score2"),
        abs(((lit(59.9) + col("id")) % lit(150.0)) - lit(100.0)).as("dist"),
        floor((lit(59.9) + col("id")) % lit(150.0)).cast("bigint").as("fl"),
        ceil((lit(59.9) + col("id")) % lit(150.0)).cast("bigint").as("ce"),
        pow(col("id") % 10, lit(2.0)).as("sq"),
        // micros-BIGINT absorbs a possible last-ulp ln() difference
        // between the JVM and DuckDB math libraries
        round(log(col("id") + 1) * lit(1e6)).cast("long").as("ln1p_micros"),
        sqrt(col("id").cast("double")).as("rt")
      ).orderBy("id"),
      Some("""SELECT id, id % 7 AS mod7,
             |(CAST(59.9 AS DOUBLE)+id)%CAST(150.0 AS DOUBLE) AS score2,
             |abs((CAST(59.9 AS DOUBLE)+id)%CAST(150.0 AS DOUBLE) - CAST(100.0 AS DOUBLE)) AS dist,
             |CAST(floor((CAST(59.9 AS DOUBLE)+id)%CAST(150.0 AS DOUBLE)) AS BIGINT) AS fl,
             |CAST(ceil((CAST(59.9 AS DOUBLE)+id)%CAST(150.0 AS DOUBLE)) AS BIGINT) AS ce,
             |pow(id % 10, 2.0) AS sq,
             |CAST(ROUND(ln(id + 1) * 1e6) AS BIGINT) AS ln1p_micros,
             |sqrt(CAST(id AS DOUBLE)) AS rt
             |FROM range(0,1000) t(id) ORDER BY id""".stripMargin)),

    QueryDef("q35_array_funcs",
      (s, dir) => {
        val v = transform(col("embedding"), x => x.cast("double"))
        Tables.embeddings(s, dir).select(
          col("vec_id"),
          size(col("embedding")).cast("bigint").as("dim"),
          aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
            .as("norm2"),
          v.getItem(0).as("e0")
        ).orderBy("vec_id").limit(100)
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             |list_reduce(list_prepend(0.0, list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)), (a,b) -> a+b) AS norm2,
             |CAST(embedding[1] AS DOUBLE) AS e0
             |FROM embeddings ORDER BY vec_id LIMIT 100""".stripMargin)),

    // array_sort / slice / array_position / array_distinct as outputs
    // (string-joined so both engines serialize identically);
    // array_position absence: Spark yields 0, DuckDB NULL → NULLIF.
    QueryDef("q90_array_ops",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir).select(
          col("doc_id"),
          concat_ws(" ", slice(array_sort(toks), 1, 5)).as("first5_sorted"),
          nullif(array_position(toks, "the"), lit(0)).cast("bigint").as("pos_the"),
          size(array_distinct(toks)).cast("bigint").as("n_unique"),
          concat_ws(" ", slice(toks, -3, 3)).as("last3")
        ).orderBy("doc_id").limit(300)
      },
      Some("""SELECT doc_id,
             |  array_to_string(list_sort(string_split(text,' '))[1:5], ' ') AS first5_sorted,
             |  CAST(NULLIF(list_position(string_split(text,' '), 'the'), 0) AS BIGINT) AS pos_the,
             |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_unique,
             |  array_to_string(string_split(text,' ')[-3:], ' ') AS last3
             |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin)),

    QueryDef("q36_map_json",
      (s, dir) => Tables.events(s, dir).select(
          element_at(from_json(col("props"), MapType(StringType, IntegerType)), "k").as("k"))
        .groupBy((col("k") % 10).as("kmod"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("kmod"),
      Some("""SELECT CAST(json_extract_string(props,'$.k') AS INT) % 10 AS kmod, COUNT(*) AS cnt
             |FROM events GROUP BY 1 ORDER BY kmod""".stripMargin)),

    // Map higher-order functions: build a 3-entry map per row, then
    // transform_values → transform_keys → map_filter; the output is a
    // canonical sorted entries string, because map iteration order is
    // engine-specific but entry SETS are not. The oracle replays the
    // per-entry arithmetic directly.
    QueryDef("q132_map_hofs",
      (s, dir) => {
        val k = element_at(from_json(col("props"), MapType(StringType, IntegerType)), "k")
        Tables.events(s, dir).filter(col("event_id") < 100)
          .select(col("event_id"), k.as("k"))
          .select(col("event_id"),
            map_filter(
              transform_keys(
                transform_values(
                  map(lit("a"), col("k"), lit("b"), col("k") + 1, lit("c"), col("k") * col("k")),
                  (_, v) => v * 2),
                (key, _) => upper(key)),
              (_, v) => v % 4 === 0).as("m"))
          .select(col("event_id"),
            concat_ws(",", array_sort(transform(map_entries(col("m")),
              e => concat(e.getField("key"), lit(":"), e.getField("value").cast("string")))))
              .as("entries"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, array_to_string(list_filter([
             |    CASE WHEN (2*k) % 4 = 0 THEN 'A:' || CAST(2*k AS VARCHAR) END,
             |    CASE WHEN (2*(k+1)) % 4 = 0 THEN 'B:' || CAST(2*(k+1) AS VARCHAR) END,
             |    CASE WHEN (2*k*k) % 4 = 0 THEN 'C:' || CAST(2*k*k AS VARCHAR) END
             |  ], x -> x IS NOT NULL), ',') AS entries
             |FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |      FROM events WHERE event_id < 100)
             |ORDER BY event_id""".stripMargin)),

    // Deterministic array aggregation: collect_set canonicalized by
    // array_sort before serialization (collection order is
    // partitioning-dependent; the sorted set is not).
    QueryDef("q133_array_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(concat_ws(",", transform(
          array_sort(collect_set((col("user_id") % 50).cast("int"))),
          v => v.cast("string"))).as("ids"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  array_to_string(list_sort(list(DISTINCT CAST(user_id % 50 AS INT))), ',') AS ids
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("q37_explode_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20),
      Some("""SELECT token, COUNT(*) AS cnt FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin))
  )
}
