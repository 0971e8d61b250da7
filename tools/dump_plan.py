"""Dump .explain("formatted") for named entries to files.

Usage: python tools/dump_plan.py OUTDIR SUFFIX ENTRY [ENTRY ...]
Writes OUTDIR/<entry>_<SUFFIX>.txt
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
bench._redirect_stderr()
import __spark_entry__ as e
from gapless_deribit_clickhouse_spark.core.session import get_spark

outdir, suffix = sys.argv[1], sys.argv[2]
entries = sys.argv[3:]
os.makedirs(outdir, exist_ok=True)
spark = get_spark(app_name="dump_plan")
qs = e.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for name in entries:
    df = qs[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)
    print("wrote", name, flush=True)
