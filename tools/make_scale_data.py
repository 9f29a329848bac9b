"""Synthesize an N-fold replica of an sf dir for scale-proof runs.

/root/testdata is read-only and the driver provides no generator, so the
larger corpus is built by replicating each FACT table N times with all
primary/foreign keys offset per copy (referential integrity preserved:
copy i of orders references copy i's customers). region/nation stay
fixed — they are fixed-size dimensions at every TPC-H scale factor.
Non-key payload columns (text, embeddings, timestamps) are repeated
verbatim, which is the interesting stress for the dedup/similarity
family: every bucket gets N-fold membership and the capped-pair designs
must hold.

Fact tables are written as a DIRECTORY of factor x ceil(32/factor)
parquet files (one explicit COPY per copy/chunk — a single COPY with
PER_THREAD_OUTPUT writes ONE file here because the cross-join source
defeats DuckDB's parallel writer), never one file: the single-file
layout serialized every scan onto one input split regardless of cores,
which contaminated every scan-bound scaling measurement (p2 read 4.7x
at 10x purely from the artifact). A directory named `{table}.parquet`
reads identically in Spark (directory scan) and DuckDB (tests.oracle
globs `dir/*.parquet`).

Usage: python tools/make_scale_data.py [src_sf_dir] [dst_dir] [factor]
         [--tables=events,...] [--also-offset=events:user_id,...]
Defaults: /root/testdata/sf0.1 /tmp/jh_scale_10x 10

--tables restricts generation to a subset (e.g. an events-only corpus
for the stateful stress rung). --also-offset appends extra columns to
a table's offset-key list: the default KEYS offsets only true row keys,
so replicated corpora keep the BASE cardinality on every dimension-ish
column (events has 1,500 users at every factor — fine for shuffle
stress, useless for STATE-capacity stress). Offsetting events:user_id
gives factor x 1,500 distinct users, turning the key space itself into
the scaled axis (round-10 high-cardinality stateful stress)."""

from __future__ import annotations

import os
import sys

import duckdb

# key columns offset per copy; every other column rides along unchanged
KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ("region", "nation")
OFFSET = 100_000_000  # > any base key at sf0.1, so copies never collide


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/tmp/jh_scale_10x"
    factor = int(args[2]) if len(args) > 2 else 10
    only = next((a.split("=", 1)[1].split(",") for a in sys.argv
                 if a.startswith("--tables=")), None)
    for spec in next((a.split("=", 1)[1].split(",") for a in sys.argv
                      if a.startswith("--also-offset=")), []):
        tbl, col = spec.split(":")
        if col not in KEYS[tbl]:
            KEYS[tbl].append(col)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    for name in FIXED_DIMS if only is None else [d for d in FIXED_DIMS if d in only]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{name}.parquet')) "
            f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"{name}: copied fixed dim")

    for name, keys in KEYS.items():
        if only is not None and name not in only:
            continue
        src_path = f"{src}/{name}.parquet"
        if not os.path.exists(src_path):
            print(f"{name}: missing in {src}, skipped")
            continue
        # cast back to the original column type so the scaled parquet
        # schema is byte-identical to the driver's (bigint widening from
        # the offset arithmetic would change int32 columns)
        types = {
            r[0]: r[1]
            for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{src_path}')").fetchall()
        }
        # one parquet file per (copy, chunk) under a directory named
        # {name}.parquet — an honest multi-split layout for both engines
        # (Spark scans the dir; tests.oracle globs dir/*.parquet).
        # chunks-per-copy tops the file count up to >= 32 even at small
        # factors; the chunk filter hashes the first key column, so the
        # split is deterministic and disjoint-and-complete per copy.
        # clear ANY stale artifact — a leftover single file, or a dir
        # from a previous run with a different factor/chunking whose
        # surviving part files would silently duplicate rows in the glob
        out = f"{dst}/{name}.parquet"
        if os.path.isfile(out):
            os.remove(out)
        elif os.path.isdir(out):
            import shutil  # noqa: PLC0415

            shutil.rmtree(out)
        os.makedirs(out)
        chunks = max(1, -(-32 // factor))  # ceil(32/factor)
        for i in range(factor):
            repl = ", ".join(
                f"CAST({k} + {i * OFFSET} AS {types[k]}) AS {k}" for k in keys
            )
            for j in range(chunks):
                where = (
                    f"WHERE hash({keys[0]}) % {chunks} = {j}" if chunks > 1 else ""
                )
                con.execute(
                    f"COPY (SELECT t.* REPLACE ({repl}) "
                    f"FROM read_parquet('{src_path}') t {where}) "
                    f"TO '{out}/data_{i:03d}_{j:02d}.parquet' (FORMAT PARQUET)"
                )
        n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/*.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows ({factor}x) in {n_files} files")


if __name__ == "__main__":
    main()
