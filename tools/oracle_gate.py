"""Full driver-style correctness gate: run EVERY queries() entry and
value-compare against its DuckDB oracle on the same parquet tables —
the local twin of the driver's CORRECTNESS_r{N}.json run.

    python tools/oracle_gate.py [sf_dir] [name_substr ...]
                                              # default /root/testdata/sf0.01;
                                              # extra args filter query names

Exit code 0 iff every oracle-backed query matches (columns sorted by
name, rows sorted, values compared with rtol=1e-9); oracle-less queries
get a rows-only smoke check.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]
    from api_to_parquet_spark import get_spark

    spark = get_spark("oracle_gate", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    fails: list[str] = []
    n_checked = 0
    for name in sorted(qs):
        if name_filters and not any(f in name for f in name_filters):
            continue
        n_checked += 1
        try:
            if name not in oracles:
                n = qs[name](spark, sf_dir).count()
                print(f"rows-only {name}: {n} rows")
                continue
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            cols = sorted(sdf.columns)
            assert cols == sorted(odf.columns), (
                f"columns {cols} vs {sorted(odf.columns)}"
            )
            sortable = [
                c
                for c in cols
                if sdf[c].dtype != object
                or (len(sdf) and isinstance(sdf[c].iloc[0], str))
            ]
            sdf = sdf[cols].sort_values(sortable or cols).reset_index(drop=True)
            odf = odf[cols].sort_values(sortable or cols).reset_index(drop=True)
            assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
            for c in cols:
                # Driver-mimic strictness: its compare value-HASHES every
                # cell, so (a) no cell may be unhashable (list/ndarray —
                # arrays must be flattened or serialized to strings in
                # BOTH sides), and (b) int-vs-float dtype drift (e.g.
                # DuckDB HUGEINT -> float64 via .df()) hashes differently
                # even when values are numerically equal.
                for frame, side in ((sdf, "spark"), (odf, "oracle")):
                    if len(frame) and frame[c].dtype == object:
                        v = frame[c].iloc[0]
                        assert not hasattr(v, "__iter__") or isinstance(
                            v, (str, bytes)
                        ), f"column {c} ({side}) holds unhashable {type(v).__name__}"
                s_int = pd.api.types.is_integer_dtype(sdf[c])
                o_int = pd.api.types.is_integer_dtype(odf[c])
                s_f = pd.api.types.is_float_dtype(sdf[c])
                o_f = pd.api.types.is_float_dtype(odf[c])
                assert s_int == o_int and s_f == o_f, (
                    f"column {c} dtype drift: spark {sdf[c].dtype}"
                    f" vs oracle {odf[c].dtype} (hash-unsafe)"
                )
                pd.testing.assert_series_equal(
                    sdf[c],
                    odf[c],
                    check_dtype=False,
                    check_exact=not s_f,
                    rtol=1e-9,
                    check_names=False,
                )
                if s_f and len(sdf):
                    ne = (
                        sdf[c].fillna(-1e308) != odf[c].fillna(-1e308)
                    ).sum()
                    assert ne == 0, (
                        f"column {c}: {ne} float cells not bitwise-equal"
                        " (driver hash would mismatch)"
                    )
        except Exception as exc:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"FAIL {name}: {str(exc)[:200]}")
    print(f"checked {n_checked} queries at {sf_dir}; fails: {len(fails)} {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
