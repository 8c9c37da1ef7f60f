"""Local replica of the driver's DuckDB-oracle correctness gate.

For every registry query with an oracle: run the Spark plan and the
DuckDB SQL over the same sf0.01 parquet, then compare row count, column
names, and order-insensitive per-cell values (normalized like a
value-hash would see them). Catching a mismatch here is much cheaper
than losing a round to CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from ais_data_pipeline_spark.queries import registry
from ais_data_pipeline_spark.sources.parquet import TABLES

QUERIES = registry()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    # Replicates the driver's TYPE-SENSITIVE value hash: a Decimal on one
    # side and a float on the other must FAIL here (that asymmetry cost 12
    # queries in round 1). Only date-vs-midnight-timestamp rendering is
    # normalized — driver round-1 evidence (date_parse_lenient green) shows
    # DATE columns compare fine across engines.
    if v is not None and type(v).__module__ == "numpy":
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
        v = v.item()
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        # scale-preserving: Decimal('1.10') != Decimal('1.1') != 1.1
        return "dec:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v

def _norm_rows(rows, columns):
    # driver compare sorts columns by name, then hashes values
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _pd_rows(pdf):
    import pandas as pd

    return [
        tuple(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NaT else v for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


@pytest.mark.parametrize("q", [q for q in QUERIES if q.oracle], ids=lambda q: q.name)
def test_oracle_match(spark, sf_dir, q):
    # Go through pandas on BOTH sides, like the driver: duckdb's .df()
    # surfaces sum(DECIMAL) as float64 while Spark's toPandas keeps exact
    # Decimal objects — exactly the representation gap the driver hashes.
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = _pd_rows(sdf.toPandas())

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = _pd_rows(res.df())

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{q.name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{q.name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_rows, spark_cols), _norm_rows(duck_rows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
    assert not mism, (
        f"{q.name}: {len(mism)} differing rows; first: spark={ns[mism[0]]} duck={nd[mism[0]]}"
    )


def test_entry_smoke(spark, smoke_dir):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
    names = set(entrymod.queries())
    oracle = entrymod.oracle_sql()
    assert set(oracle) <= names


def test_front_window_well_formed():
    """The driver checks only the first 50 registry entries; the window
    must stay exactly 50 unique, registered names so a careless edit
    can't silently drop a query out of driver verification."""
    from ais_data_pipeline_spark.queries import _FRONT_WINDOW, _REGISTRY

    assert len(_FRONT_WINDOW) == 50
    assert len(set(_FRONT_WINDOW)) == 50
    registered = {q.name for q in _REGISTRY}
    missing = [n for n in _FRONT_WINDOW if n not in registered]
    assert not missing, missing
    names = [q.name for q in QUERIES]
    assert names[:50] == _FRONT_WINDOW


def test_registry_driver_proof_freshness():
    """Staleness gate (r15 brief item 6): at 203 rows and a 50-slot
    driver window, untouched rows go ~4 rounds between external
    driver proofs and the gap grows with the registry. This gate
    bounds it mechanically: every registered row must either carry a
    driver CORRECTNESS proof no older than STALE_MAX rounds behind
    the newest recorded round, or — for rows registered since the
    last driver run — be scheduled in the front window for the next
    one. The local oracle replica above covers correctness; this
    gates the EXTERNAL signal's freshness, forcing window plans to
    rotate cohorts oldest-first before any row falls off the radar.
    """
    import glob as _glob
    import json
    import re

    STALE_MAX = 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(_glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(r)
        with open(f) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), r)
    if not rounds:
        pytest.skip("no driver CORRECTNESS artifacts yet")
    newest = max(rounds)

    from ais_data_pipeline_spark.queries import _FRONT_WINDOW

    window = set(_FRONT_WINDOW[:50])
    stale, unscheduled = [], []
    for q in QUERIES:
        r = latest.get(q.name)
        if r is None:
            # never driver-checked: must lead the NEXT window
            if q.name not in window:
                unscheduled.append(q.name)
        elif newest - r > STALE_MAX and q.name not in window:
            stale.append((q.name, r))
    assert not unscheduled, (
        f"registry rows never driver-proven and not in the next "
        f"50-slot window: {unscheduled}"
    )
    assert not stale, (
        f"rows whose latest driver proof is >{STALE_MAX} rounds old "
        f"and not scheduled next: {stale} (newest round {newest}) — "
        f"rotate them into _FRONT_WINDOW or grow the window"
    )
