"""Quick manual smoke of the engine core against sf0.001 testdata."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from configurable_etl_python_repo_spark import get_spark
from configurable_etl_python_repo_spark.plans import AnalytePlan, Engine, OpSpec, ScanSpec

SF = "/root/testdata/sf0.001"

spark = get_spark("smoke", shuffle_partitions=8)
eng = Engine(spark)

plan = AnalytePlan(
    name="top_lines",
    scans=[
        ScanSpec(name="li", source="parquet", path=f"{SF}/lineitem.parquet",
                 filter="l_quantity >= NUMBER(30) & l_returnflag = A",
                 columns=["l_orderkey", "l_linenumber", "l_quantity",
                          "l_extendedprice", "l_shipdate", "ghost_col"]),
        ScanSpec(name="ord", source="parquet", path=f"{SF}/orders.parquet"),
    ],
    ops=[
        OpSpec("RENAME COLUMN", "ord", ["ord"], {"renames": {"o_orderkey": "l_orderkey"}}),
        OpSpec("LEFT JOIN", "j", ["li", "ord"], {"on": ["l_orderkey"]}),
        OpSpec("SORT DATASET", "j", ["j"], {"columns": ["l_extendedprice", "l_linenumber"], "order": "DESC"}),
        OpSpec("GROUPBY SLICE", "top_lines", ["j"], {"group_by": ["l_orderkey"], "n": 1}),
    ],
)
df = eng.run_analyte(plan)
df.show(5)
print("rows:", df.count(), "cols:", df.columns)

# order-sensitive agg: last shipdate's partkey per orderkey
plan2 = AnalytePlan(
    name="last_part",
    scans=[ScanSpec(name="li2", source="parquet", path=f"{SF}/lineitem.parquet")],
    ops=[
        OpSpec("SORT DATASET", "li2", ["li2"], {"columns": ["l_shipdate", "l_linenumber"]}),
        OpSpec("GROUPBY SUMMARISE", "last_part", ["li2"],
               {"group_by": ["l_orderkey"], "aggs": [("l_partkey", "last"), ("l_quantity", "min")]}),
    ],
)
df2 = eng.run_analyte(plan2)
df2.show(3)

# decision + sumeq + bind rows
plan3 = AnalytePlan(
    name="dec",
    scans=[ScanSpec(name="li3", source="parquet", path=f"{SF}/lineitem.parquet",
                    columns=["l_orderkey", "l_returnflag", "l_quantity", "l_discount"])],
    lookup_tables={"flag_map": [{"key": "A", "output": 1}, {"key": "N", "output": 2}]},
    ops=[
        OpSpec("DECISION COLUMN", "d1", ["li3"],
               {"lookup_column": "l_returnflag", "new_column": "flag_code", "table": "flag_map"}),
        OpSpec("ATTACH COLUMN", "d2", ["d1"],
               {"operation": "NOTNULL", "new_column": "has_code", "column": "flag_code"}),
        OpSpec("ATTACH COLUMN", "dec", ["d2"],
               {"operation": "SUMEQ", "new_column": "sums_eq", "columns": ["has_code", "has_code"]}),
    ],
)
df3 = eng.run_analyte(plan3)
df3.show(3)
df3.groupBy("flag_code", "sums_eq").count().show()

print("SMOKE OK")
spark.stop()
