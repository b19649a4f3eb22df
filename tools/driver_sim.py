"""Local simulation of the driver's CORRECTNESS gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count, schema (column names), and a value hash with columns sorted by
name — the same discipline the driver applies."""
import hashlib
import importlib.util
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list, str]:
    cols = sorted(df.columns)
    df = df[cols]
    # stable row order: sort by all columns stringified
    s = df.astype(str)
    df = df.iloc[s.sort_values(by=cols).index]
    h = hashlib.md5()
    for _, row in df.iterrows():
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.6g}"
            h.update(str(v).encode())
            h.update(b"\x1f")
        h.update(b"\n")
    return len(df), cols, h.hexdigest()


def main():
    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs, osql = m.queries(), m.oracle_sql()
    out, bad = {}, []
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
            sr, sc, sh = canon(sdf)
            sql = osql.get(name)
            if sql is None:
                out[name] = {"rows": sr, "no_oracle": True}
                continue
            odf = con.execute(sql).fetchdf()
            orr, oc, oh = canon(odf)
            rec = {
                "rows_match": sr == orr,
                "schema_match": sc == oc,
                "hash_match": sh == oh,
                "spark_rows": sr,
                "oracle_rows": orr,
            }
            out[name] = rec
            if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                bad.append(name)
                rec["spark_cols"], rec["oracle_cols"] = sc, oc
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": str(e)[:300]}
            bad.append(name)
        print(name, "OK" if name not in bad else "FAIL", flush=True)
    print(json.dumps({k: v for k, v in out.items() if k in bad}, indent=1))
    print(f"green {len(out) - len(bad)}/{len(out)}; fail: {bad}")


if __name__ == "__main__":
    main()
