#!/usr/bin/env python3
"""Flatten a ScaleData output dir into testdata-shaped single-file
tables so the DuckDB oracle gate (tools/check.py) can run at the
scaled SF: Spark writes each table as a directory of part files and
loses the TIMESTAMP(NANOS) annotation on events.ts (it reads it via
nanosAsLong); DuckDB's read_parquet wants the single-file layout and
the ns annotation the original testdata carries. Usage:

  sbt "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/sf1 10"
  python3 tools/flatten_sf.py /tmp/sf1 /tmp/sf1f
  sbt "runMain graft.Verify /tmp/sf1f /tmp/verify_sf1"
  python3 tools/check.py /tmp/sf1f /tmp/verify_sf1
"""
import os
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = ds.dataset(f"{src}/{t}.parquet", format="parquet").to_table()
        if t == "events" and pa.types.is_int64(tbl.schema.field("ts").type):
            # legacy ScaleData output only: the nanosAsLong read of the
            # old int64-nanos testdata dropped the TIMESTAMP(NANOS)
            # annotation — restore it. The current testdata ships native
            # TIMESTAMP(MICROS) which passes through unchanged (both
            # engines read it directly).
            i = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(i, pa.field("ts", pa.timestamp("ns")),
                                 tbl.column("ts").cast(pa.timestamp("ns")))
        # cap row-group size: pyarrow's default packs small tables into
        # ONE row group, and Spark parallelizes a parquet scan at
        # row-group granularity — a single-group 500k-doc file turns
        # the scan stage single-threaded (measured: doc_lm_score 157s
        # vs 30s at sf10 on identical content). <=128 groups per table
        # keeps footer metadata small while restoring scan parallelism;
        # DuckDB reads either layout identically.
        rg = max(16_384, -(-tbl.num_rows // 128))
        pq.write_table(tbl, f"{dst}/{t}.parquet", row_group_size=rg)
        print(t, tbl.num_rows)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
