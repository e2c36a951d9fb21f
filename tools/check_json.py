#!/usr/bin/env python3
"""check.py with a CORRECTNESS_r{N}-style JSON artifact.

Same compare as tools/check.py (rows sorted, columns sorted by name,
values canonicalized), but emits a JSON map per query:
  {"<name>": {"rows_match": bool, "schema_match": bool,
              "hash_match": bool, "spark_rows": N, "oracle_rows": N,
              "err": null|str}, ...}
plus optional excluded entries (name -> reason) passed as a JSON file,
recorded with err="excluded: <reason>" so the artifact states what was
NOT gated and why. Usage:

  python3 tools/check_json.py <sfDir> <outDir> <artifact.json> [excluded.json]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check import canon  # the one canonicalizer, never two


def main(sf_dir, out_dir, artifact, excluded_file=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    report = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = entry
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            entry["err"] = "no spark output"; n_fail += 1
            print(f"FAIL {name}: no spark output"); continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            entry["err"] = str(e)[:300]; n_fail += 1
            print(f"FAIL {name}: {e}"); continue
        entry["spark_rows"] = int(len(got))
        entry["oracle_rows"] = int(len(want))
        entry["schema_match"] = list(got.columns) == list(want.columns)
        entry["rows_match"] = len(got) == len(want)
        entry["hash_match"] = bool(
            entry["schema_match"] and entry["rows_match"] and got.equals(want))
        if entry["hash_match"]:
            n_pass += 1; print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1; print(f"FAIL {name}")
    if excluded_file:
        for name, reason in json.load(open(excluded_file)).items():
            # idempotent prefixing: an excluded.json regenerated from a
            # previous ARTIFACT already carries "excluded: " — re-adding
            # it made reasons non-greppable (round-14 advice)
            while reason.startswith("excluded: "):
                reason = reason[len("excluded: "):]
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"excluded: {reason}"}
    json.dump(report, open(artifact, "w"), indent=1, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
