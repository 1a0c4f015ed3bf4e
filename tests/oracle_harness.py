"""Local replica of the driver's DuckDB-oracle comparison: run a
registered query on Spark and its oracle on DuckDB over the same
parquet, compare row count + column names + order-insensitive values
(columns sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb

from log2ck_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_df()


# --------------------------------------------------------------------------
# Hostile fixture: sf0.001 with NULLs injected into every GROUP-BY-able
# key column. Real data has NULL keys; the driver's fixtures do not, so
# a query and its oracle can silently disagree on NULL-key semantics
# (Spark concat() nulls a whole line where DuckDB's skips the arg;
# equi-joins drop NULL keys; ASC sorts place NULL first vs last) and
# stay green for rounds. Found live in r8: 10 of 169 oracle-bearing
# queries diverged here before the corpus-completeness and null-safe-
# join fixes. `python scripts/driver_replica.py --hostile` replays the
# full registry on this fixture; tests/test_hostile_parity.py pins the
# sentinel subset.
# --------------------------------------------------------------------------

_HOSTILE_REWRITES = {
    # ~10% NULL group keys, deterministic by primary key
    "events": (
        "SELECT event_id, ts, user_id,"
        " CASE WHEN event_id % 10 = 3 THEN NULL ELSE event_type END"
        " AS event_type, value, props"
    ),
    "documents": (
        "SELECT doc_id, text,"
        " CASE WHEN doc_id % 11 = 4 THEN NULL ELSE lang END AS lang,"
        " CASE WHEN doc_id % 13 = 5 THEN NULL ELSE source END AS source,"
        " n_chars"
    ),
    "embeddings": (
        "SELECT vec_id, embedding,"
        " CASE WHEN vec_id % 7 = 2 THEN NULL ELSE label END AS label"
    ),
}


def build_hostile_fixture(src: str = "/root/testdata/sf0.001") -> str:
    """Materialize the NULL-key fixture through the repo's own staging
    machinery (scratch_dir keys on the SOURCE content fingerprint +
    STAGING_VERSION + a digest of the rewrite recipe, so regenerated
    testdata or an edited _HOSTILE_REWRITES re-stages instead of
    serving stale bytes; ensure_staged commits a _SUCCESS marker LAST
    and the writer wipes first, so a crashed half-build is re-run, not
    trusted). Pure DuckDB — single-file parquet per table, the same
    layout as the real fixtures. Same no-concurrent-stagers caveat as
    every other staged corpus."""
    import hashlib
    import shutil

    from log2ck_spark.io import ensure_staged, scratch_dir

    if not os.path.isdir(src):
        raise FileNotFoundError(f"no testdata at {src}")
    recipe = hashlib.md5(
        repr(sorted(_HOSTILE_REWRITES.items())).encode()
    ).hexdigest()[:8]
    path = scratch_dir(src, "hostile_nullkeys", recipe)

    def _write(p: str) -> None:
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        con = duckdb.connect()
        for t in TABLES:
            sel = _HOSTILE_REWRITES.get(t, "SELECT *")
            con.execute(
                f"COPY ({sel} FROM"
                f" read_parquet('{os.path.join(src, t)}.parquet'))"
                f" TO '{os.path.join(p, t)}.parquet' (FORMAT PARQUET)"
            )
        open(os.path.join(p, "_SUCCESS"), "w").close()

    return ensure_staged(path, _write)


def canonical(df_pandas):
    """Sort columns by name, normalize values for comparison."""
    pdf = df_pandas.copy()
    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    rows = sorted(tuple(norm(v) for v in row) for row in pdf.itertuples(index=False))
    return list(pdf.columns), rows


def driver_canon_check(pdf) -> str | None:
    """Replicate the DRIVER's canonicalizer, which sorts the pandas
    frame with sort_values over every column — pandas factorizes each
    column, and list/ndarray cells raise `TypeError: unhashable type`.
    Our own `canonical` stringifies arrays and is therefore MORE
    lenient; this check closes that gap so array-typed outputs are
    caught locally before the external harness sees them (the exact
    failure mode of embedding_normalize/quantize in round 3)."""
    try:
        pdf[sorted(pdf.columns)].sort_values(by=sorted(pdf.columns))
    except TypeError as exc:
        return f"driver-canon failure (unhashable output column?): {exc}"
    return None


def compare(spark_df, oracle_pdf) -> list[str]:
    """Returns list of mismatch descriptions (empty = pass)."""
    problems = []
    spark_pdf = spark_df.toPandas()
    driver_problem = driver_canon_check(spark_pdf)
    if driver_problem:
        problems.append(driver_problem)
    s_cols, s_rows = canonical(spark_pdf)
    o_cols, o_rows = canonical(oracle_pdf)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differ: spark={len(s_rows)} oracle={len(o_rows)}")
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if sr != orow:
            problems.append(f"first diff at sorted row {i}: spark={sr} oracle={orow}")
            break
    return problems
