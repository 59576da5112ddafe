"""Demonstrate the cost-based optimizer earning its keep (SURVEY §4.2).

Path-based parquet reads carry no table statistics, so CBO is inert in
the regular catalog run. This tool shows the stats-driven plan change
the engine gets the moment tables are catalog-registered and ANALYZEd:

  1. register the TPC-H-ish tables as catalog tables over the same
     parquet files (CREATE TABLE ... USING parquet LOCATION ...),
  2. ANALYZE TABLE ... COMPUTE STATISTICS (+ FOR ALL COLUMNS),
  3. plan the q65-shaped 5-table snowflake join written in a
     deliberately bad syntactic order (fact first, dims last),
  4. diff the optimized join tree with CBO+stats on vs off.

Run:  python tools/cbo_demo.py [--sf /root/testdata/sf0.01]
Prints both join trees and appends/updates the '## CBO' section in
PLANS.md with the evidence.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.engine.session import get_spark

# q65's join graph, syntactically ordered WORST-first: the two huge
# facts joined before any dim. Statistics are what let the optimizer
# see this; without them it trusts the syntax (modulo broadcast
# threshold on file sizes).
BAD_ORDER_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS volume,
       COUNT(*) AS n_lines
FROM lineitem, orders, customer, nation, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

TABLES = ("region", "nation", "customer", "orders", "lineitem")


def join_tree(df) -> str:
    """The optimized logical join tree, relations + join nodes only —
    the part of the plan CBO's reorder actually changes."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    keep = []
    for line in plan.splitlines():
        s = line.strip(" :+-")
        if s.startswith(("Join", "Relation")):
            m = re.search(r"Relation spark_catalog\.default\.(\w+)", s)
            keep.append(
                (len(line) - len(line.lstrip(" :+-")))
                * " "
                + (f"Relation {m.group(1)}" if m else s.split("(", 1)[0].strip())
            )
    return "\n".join(keep)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--plans-md", default=os.path.join(os.path.dirname(__file__), "..", "PLANS.md"))
    args = ap.parse_args()

    spark = get_spark("cbo-demo")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet LOCATION '{args.sf}/{t}.parquet'"
        )

    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    before = join_tree(spark.sql(BAD_ORDER_SQL))

    for t in TABLES:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    after = join_tree(spark.sql(BAD_ORDER_SQL))

    stats = {
        t: spark.sql(f"DESCRIBE TABLE EXTENDED {t}")
        .filter("col_name = 'Statistics'")
        .collect()
        for t in TABLES
    }
    stat_lines = "\n".join(
        f"- `{t}`: {rows[0]['data_type']}" for t, rows in stats.items() if rows
    )

    changed = before != after
    section = f"""## CBO — stats-driven join reorder (tools/cbo_demo.py, sf={os.path.basename(args.sf.rstrip('/'))})

`spark.sql.cbo.enabled=true` + `joinReorder` are on in the engine
session (engine/session.py); stats exist once tables are
catalog-registered and ANALYZEd, which this tool does over the same
parquet files. Evidence on the q65-shaped 5-table snowflake written
fact-first (worst syntactic order):

ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS] recorded:
{stat_lines}

Optimized join tree WITHOUT stats (cbo off):

```
{before}
```

Optimized join tree WITH stats (cbo + joinReorder on):

```
{after}
```

Join order {"CHANGED — the reorder is stats-driven" if changed else "did not change at this SF (broadcast thresholds already pick the right shape; at cluster scale with >8 relations the reorderer is the lever)"}.
"""
    print(section)

    plans_path = os.path.abspath(args.plans_md)
    text = open(plans_path).read() if os.path.exists(plans_path) else "# PLANS\n"
    if "## CBO" in text:
        text = re.sub(r"## CBO.*?(?=\n## |\Z)", section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section
    with open(plans_path, "w") as f:
        f.write(text)
    print(f"[written to {plans_path}]")


if __name__ == "__main__":
    main()
