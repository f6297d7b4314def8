"""Driver-contract simulation (the /verify drive recipe as a script):
vanilla session, entry() smoke check, every queries()[name] at sf0.01
hash-compared against oracle_sql()[name] via DuckDB."""
import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
from pyspark.sql import SparkSession

def main():
    spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from oracle_utils import compare, duckdb_conn
    con = duckdb_conn('/root/testdata/sf0.01')
    df = e.entry(spark)
    assert len(df.collect()) > 0
    qs, osql = e.queries(), e.oracle_sql()
    bad = 0
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, '/root/testdata/sf0.01')
        if name in osql:
            p = compare(sdf, con.sql(osql[name]))
            if p:
                bad += 1
                print("MISMATCH", name, p[:2], flush=True)
        else:
            sdf.count()
    print("TOTAL_MISMATCHES:", bad, flush=True)

if __name__ == "__main__":
    main()
