"""SQL-database sink/source on stdlib sqlite3.

Parity target: the reference's PostGIS writer
(/root/reference/dggstools/rhpx/utils/storage.py:17-29,
`geodataframe_to_postgis` — store the frame "as is" into a DB table via one
engine connection, honoring `if_exists` and `chunksize`).  This sandbox has
no network or postgres, so the same operator shape is provided against a
file-backed sqlite3 database: identical contract (table name, fail /
replace / append, chunked streaming writes), swappable for a postgres
connection outside the sandbox.

Like the reference's single-engine `to_postgis`, the sink funnels through
one writer connection — SQL databases are single-writer sinks by nature, so
the Dataset is STREAMED through the driver in bounded batches
(`iter_batches`), never materialized.  This sink is for query/visualization
exports (the reference's use case), not for bulk 100 TB output — that is
what partitioned parquet (`io.storage`) is for.

A `<table>_meta` key/value side table carries the same attrs dict the
GeoPackage/parquet writers persist, so DGGS metadata survives the trip.
"""
from __future__ import annotations

import json
import sqlite3

import numpy as np
import pyarrow as pa

_AFFINITY = [
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_boolean, "INTEGER"),
    (pa.types.is_floating, "REAL"),
    (pa.types.is_string, "TEXT"),
    (pa.types.is_large_string, "TEXT"),
    (pa.types.is_binary, "BLOB"),
    (pa.types.is_large_binary, "BLOB"),
]


def _sql_type(t: pa.DataType) -> str:
    for pred, name in _AFFINITY:
        if pred(t):
            return name
    # lists / structs / timestamps ride along as JSON text
    return "TEXT"


def _column_cells(col: pa.ChunkedArray):
    """Python cell values for sqlite binding; non-scalar types as JSON."""
    t = col.type
    if any(pred(t) for pred, _ in _AFFINITY):
        return col.to_pylist()
    return [None if v is None else json.dumps(v, default=str)
            for v in col.to_pylist()]


def dataset_to_sqldb(ds, db_path: str, table: str, if_exists: str = "fail",
                     metadata: dict | None = None, chunksize: int = 4096):
    """Write a Ray Dataset (or pyarrow Table) to `table` in a sqlite DB.

    if_exists: "fail" (error if the table exists) | "replace" | "append" —
    the reference `to_postgis` contract.  Returns the number of rows
    written.
    """
    if if_exists not in ("fail", "replace", "append"):
        raise ValueError(f"if_exists must be fail|replace|append, "
                         f"got {if_exists!r}")
    if isinstance(ds, pa.Table):
        batches = [ds]
        schema = ds.schema
    else:
        batches = ds.iter_batches(batch_size=chunksize,
                                  batch_format="pyarrow")
        schema = ds.schema().base_schema

    con = sqlite3.connect(db_path)
    try:
        cur = con.cursor()
        exists = cur.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (table,)).fetchone() is not None
        if exists and if_exists == "fail":
            raise ValueError(f"table {table!r} already exists in {db_path}")
        if exists and if_exists == "replace":
            cur.execute(f'DROP TABLE "{table}"')
            cur.execute(f'DROP TABLE IF EXISTS "{table}_meta"')
            exists = False
        if not exists:
            cols = ", ".join(f'"{f.name}" {_sql_type(f.type)}'
                             for f in schema)
            cur.execute(f'CREATE TABLE "{table}" ({cols})')
        # name the columns so appends into a pre-existing table with a
        # different column ORDER bind by name, not position
        ph = ", ".join("?" * len(schema.names))
        collist = ", ".join(f'"{c}"' for c in schema.names)
        ins = f'INSERT INTO "{table}" ({collist}) VALUES ({ph})'
        n = 0
        for bt in batches:
            if isinstance(bt, pa.RecordBatch):
                bt = pa.Table.from_batches([bt])
            cols = [_column_cells(bt.column(c)) for c in bt.column_names]
            cur.executemany(ins, list(zip(*cols)))
            n += bt.num_rows
        if metadata:
            cur.execute(f'CREATE TABLE IF NOT EXISTS "{table}_meta" '
                        f'(key TEXT PRIMARY KEY, value TEXT)')
            cur.executemany(
                f'INSERT OR REPLACE INTO "{table}_meta" VALUES (?, ?)',
                [(k, json.dumps(v, default=str))
                 for k, v in metadata.items()])
        con.commit()
        return n
    finally:
        con.close()


_ARROW_OF_AFFINITY = {"INTEGER": pa.int64(), "REAL": pa.float64(),
                      "TEXT": pa.string(), "BLOB": pa.binary()}


def sqldb_to_dataset(db_path: str, table: str, block_rows: int = 65536):
    """Read a sqlite table back as a Ray Dataset (one Arrow table per
    `block_rows` page, so downstream stages parallelize).  Column types come
    from the DECLARED sqlite affinities — not per-page value inference, which
    would give divergent block schemas when a page is all-NULL."""
    import ray.data as rd

    con = sqlite3.connect(db_path)
    try:
        cur = con.cursor()
        decl = {name: (typ or "").upper() for _, name, typ, *_ in
                cur.execute(f'PRAGMA table_info("{table}")')}
        schema = pa.schema([
            (n, _ARROW_OF_AFFINITY.get(t, pa.string()))
            for n, t in decl.items()])
        cur.execute(f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        blocks = []
        while True:
            rows = cur.fetchmany(block_rows)
            if not rows:
                break
            cols = list(zip(*rows))
            blocks.append(pa.table(
                {n: pa.array(list(c), type=schema.field(n).type)
                 for n, c in zip(names, cols)}))
        if not blocks:
            blocks = [schema.empty_table()]
        return rd.from_arrow(blocks)
    finally:
        con.close()


def read_sqldb_metadata(db_path: str, table: str) -> dict:
    con = sqlite3.connect(db_path)
    try:
        cur = con.cursor()
        try:
            rows = cur.execute(
                f'SELECT key, value FROM "{table}_meta"').fetchall()
        except sqlite3.OperationalError:
            return {}
        return {k: json.loads(v) for k, v in rows}
    finally:
        con.close()
