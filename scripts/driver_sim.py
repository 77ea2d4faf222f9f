#!/usr/bin/env python3
"""Simulate the driver's verify pass against __spark_entry__.py.

Usage: python scripts/driver_sim.py [sf_dir]  (default /root/testdata/sf0.01)

Runs entry(spark) as a smoke check, then every queries() entry vs its
oracle_sql() through DuckDB, exactly like the driver's correctness gate.
Exit code 0 iff everything matches.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_wordcount_spark.oracle import compare  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e

    spark = get_spark("driver_sim")
    t0 = time.time()
    edf = e.entry(spark)
    n = edf.count()
    schema_ok = len(edf.schema.fields) > 0
    print(f"entry(): {n} rows, schema_ok={schema_ok}, {time.time() - t0:.1f}s")

    qs, oracles = e.queries(), e.oracle_sql()
    results, failed = {}, []
    for name in sorted(qs):
        t0 = time.time()
        try:
            ok, msg = compare(spark, sf_dir, name, qs[name], oracles.get(name))
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(ex).__name__}: {ex}"
        dt = time.time() - t0
        results[name] = {"ok": ok, "msg": msg, "sec": round(dt, 2)}
        status = "OK " if ok else "FAIL"
        print(f"  {status} {name:<32} {dt:5.1f}s  {msg.splitlines()[0]}")
        if not ok:
            failed.append(name)

    print(json.dumps({"total": len(qs), "failed": failed}))
    spark.stop()
    return 1 if (n < 0 or failed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
