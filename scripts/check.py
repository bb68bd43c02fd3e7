#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares against
the parquet results Verify wrote, column-name-sorted, exact-match on
values. Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, re, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# The driver's hash is representation-sensitive in exactly the ways value
# coercion is: DuckDB HUGEINT (int128, from sum(BIGINT)) lands as float64
# after pandas coercion and DECIMAL lands as decimal.Decimal, so either vs
# Spark BIGINT/DOUBLE hash-mismatches even when repr(value) agrees (the r6
# and r8 escapes). Plain integer WIDTHS all coerce to Python int and are
# driver-equivalent (23 int32-vs-int64 queries are hash-green at the
# driver), so normalize those; keep HUGEINT / DECIMAL / FLOAT-vs-DOUBLE
# distinct.
_TYPE_ALIASES = {
    "TIMESTAMP_NS": "TIMESTAMP", "TIMESTAMP_MS": "TIMESTAMP",
    "TIMESTAMP_S": "TIMESTAMP", "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
    "TINYINT": "INTEGER", "SMALLINT": "INTEGER", "BIGINT": "INTEGER",
    "UTINYINT": "INTEGER", "USMALLINT": "INTEGER", "UINTEGER": "INTEGER",
    "UBIGINT": "INTEGER",
}


# Width tokens may also appear INSIDE composite types (STRUCT(a BIGINT),
# BIGINT[], MAP(VARCHAR, SMALLINT)); the driver's value hash coerces
# nested int widths identically to scalar ones, so substitute the same
# aliases token-wise there. Multi-word aliases (TIMESTAMP WITH TIME
# ZONE) are handled by the exact-string lookup first.
_TOKEN_RE = re.compile(
    r"\b(" + "|".join(k for k in _TYPE_ALIASES if " " not in k) + r")\b")


def norm_type(t):
    s = str(t).upper()
    if s in _TYPE_ALIASES:
        return _TYPE_ALIASES[s]
    return _TOKEN_RE.sub(lambda m: _TYPE_ALIASES[m.group(1)], s)


def lint_oracle(con, name, sql):
    """Author-time check: an oracle whose output schema contains HUGEINT
    can never hash-match Spark (Spark has no int128); DECIMAL only matches
    if the Spark side deliberately emits the same DecimalType (r6 escape
    class). Runs the oracle LIMIT 0 so it is cheap at any SF."""
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    except Exception as e:  # noqa
        return [f"LINT-ERR {name}: oracle does not parse: {e}"]
    msgs = []
    for c, t in zip(rel.columns, rel.types):
        ts = norm_type(t)
        if "HUGEINT" in ts:
            msgs.append(
                f"LINT-FAIL {name}.{c}: oracle emits {ts} (DuckDB sum(BIGINT)"
                " widens to int128; Spark cannot match — wrap the aggregate"
                " in CAST(... AS BIGINT))")
        elif ts.startswith("DECIMAL"):
            msgs.append(
                f"LINT-WARN {name}.{c}: oracle emits {ts}; hash-matches only"
                " if the Spark column is the identical DecimalType")
    return msgs


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and tiny representation noise at display level
        return repr(round(v, 9))
    return repr(v)


def frame_rows(cols, types, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], [norm_type(types[i]) for i in order], out


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            # scaled datasets are parquet DIRECTORIES of part files
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = lint_fails = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (witnessed separately)")
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        for msg in lint_oracle(con, name, sql):
            print(msg)
            if "LINT-FAIL" in msg or "LINT-ERR" in msg:
                lint_fails += 1
        try:
            got_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols, got_types, got = frame_rows(
                got_rel.columns, got_rel.types, got_rel.fetchall())
            want_rel = con.sql(sql)
            want_cols, want_types, want = frame_rows(
                want_rel.columns, want_rel.types, want_rel.fetchall())
        except Exception as e:  # noqa
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns differ\n  spark {got_cols}\n  duck  {want_cols}")
            n_fail += 1
            continue
        if got_types != want_types:
            bad = [(c, g, w) for c, g, w in zip(got_cols, got_types, want_types)
                   if g != w]
            print(f"FAIL {name}: column TYPES differ (driver hash is"
                  f" representation-sensitive): {bad}")
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
    print(f"== {n_pass} pass, {n_fail} fail, {lint_fails} lint-fail ==")
    return 1 if (n_fail or lint_fails) else 0


def lint_main(sf_dir, oracle_json):
    """check.py --lint <sfDir> <oracle_sql.json>: author-time sweep of every
    oracle's output schema, no Spark run required."""
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads(Path(oracle_json).read_text())
    fails = 0
    for name, sql in sorted(oracle.items()):
        for msg in lint_oracle(con, name, sql):
            print(msg)
            if "LINT-FAIL" in msg or "LINT-ERR" in msg:
                fails += 1
    print(f"== lint: {len(oracle)} oracles, {fails} fail ==")
    return 1 if fails else 0


if __name__ == "__main__":
    if sys.argv[1] == "--lint":
        sys.exit(lint_main(sys.argv[2], sys.argv[3]))
    # optional 3rd arg: comma-separated query names to skip (e.g. the
    # PQ-family oracles, ~25-min 64M-row CTEs each at sf10, when their
    # exactness at that SF is already recorded from a separate run)
    skip = tuple(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
