#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares against
the parquet results Verify wrote, column-name-sorted, exact-match on
values. Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and tiny representation noise at display level
        return repr(round(v, 9))
    return repr(v)


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # scaled datasets are parquet DIRECTORIES of part files
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (witnessed separately)")
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols, got = frame_rows(got_rel.columns, got_rel.fetchall())
            want_rel = con.sql(sql)
            want_cols, want = frame_rows(want_rel.columns, want_rel.fetchall())
        except Exception as e:  # noqa
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns differ\n  spark {got_cols}\n  duck  {want_cols}")
            n_fail += 1
            continue
        if got == want:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif sorted(got) == sorted(want):
            print(f"WARN {name}: row ORDER differs (values match) — driver may still pass")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows; first diffs:")
            for g, w in diff:
                print(f"  spark {g}\n  duck  {w}")
            if len(got) != len(want):
                only_g = set(got) - set(want)
                only_w = set(want) - set(got)
                for x in list(only_g)[:2]:
                    print(f"  only-spark {x}")
                for x in list(only_w)[:2]:
                    print(f"  only-duck  {x}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query names to skip (e.g. the
    # PQ-family oracles, ~25-min 64M-row CTEs each at sf10, when their
    # exactness at that SF is already recorded from a separate run)
    skip = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
