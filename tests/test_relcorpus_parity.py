"""Relational edge-corpus parity sweep (r13): the third fixture regime,
extending the r12 docs/events technique (VERDICT r12 item 4) to the
TPC-H-ish relational family.  Every registry query whose oracle reads
ONLY relational tables (region/nation/customer/supplier/part/orders/
lineitem — ~60 queries incl. all 22 TPC-H patterns) is value-hash-
compared across engines over sf0.001 AUGMENTED with the edge rows the
generated fixtures never contain:

- NULL keys (a NULL c_custkey / o_orderkey / l_orderkey / p_partkey /
  s_suppkey / n_nationkey row per table) — join and group-by NULL
  semantics;
- duplicate primary keys (two customer rows sharing c_custkey, two
  orders sharing o_orderkey, two lineitems sharing (l_orderkey,
  l_linenumber), two parts sharing p_partkey) — join fanout and
  under-determined "pick one per key" orderings;
- dangling foreign keys (an order whose custkey matches no customer, a
  lineitem whose orderkey matches no order) — outer-join and FK-audit
  paths;
- NULL dates / epoch / far-future dates, exact o_orderdate ties for one
  customer — timeline ops and row_number-over-date tie-breaks;
- zero and NEGATIVE quantities/prices/balances, discount = 1.0 (revenue
  exactly zero) — ratio, ntile and prorate arithmetic;
- NULL and empty and multi-byte-unicode strings in every VARCHAR
  column — segment/flag group-bys keep or drop the NULL bucket
  consistently.

Self-maintaining: the query list is derived from ORACLE_SQL table
references, so new relational-only queries join the sweep automatically.
Conventions pinned by the r12 sweep apply here unchanged (rollups keep
the NULL group; try_divide wherever ANSI could throw; deterministic
total orderings for every "first per key" pick)."""

from __future__ import annotations

import pathlib
import re
import shutil

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import TABLES, compare, duckdb_connection

_REL_TABLES = {"region", "nation", "customer", "supplier", "part", "orders", "lineitem"}


def _relational_queries() -> list[str]:
    names = []
    for name, sql in ORACLE_SQL.items():
        used = {t for t in TABLES if re.search(rf"\b{t}\b", sql)}
        if used and used <= _REL_TABLES:
            names.append(name)
    return sorted(names)


_TS = "TIMESTAMP '{}'"

# Edge keys live far above the sf0.001 fixture maxima (custkey<=150,
# orderkey<=6000, partkey<=200, suppkey<=10, nationkey<=24) so they
# never collide with generated rows; cross-references below are
# deliberate (edge orders -> edge customers -> edge nation, edge
# lineitems -> edge orders/parts/suppliers) so joins actually traverse
# the edge rows instead of orphaning them.
EDGE_REGION = [
    (99, "'édge régiön'"),
    (None, None),
]

EDGE_NATION = [
    # (n_nationkey, n_name, n_regionkey)
    (990, "'Ünïcødé Nation'", 99),
    (991, None, None),
    (None, "'null-key nation'", 1),
]

EDGE_CUSTOMER = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (900001, "'Edge Customer'", 990, "0.0", None),
    (900002, None, None, "-999.99", "'BUILDING'"),
    (900003, "''", 1, None, "'AUTOMOBILE'"),
    # duplicate primary key — join fanout + "one row per custkey" picks
    (900001, "'Edge Customer DUP'", 2, "500.0", "'MACHINERY'"),
    (None, "'null-key customer'", 3, "100.0", "'HOUSEHOLD'"),
]

EDGE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (910001, 900001, "'O'", "0.0", _TS.format("2024-02-29 00:00:00"), "'1-URGENT'"),
    (910002, 900002, None, None, None, None),
    # dangling custkey (no customer 909999) + epoch date
    (910003, 909999, "'F'", "123.45", _TS.format("1970-01-01 00:00:00"), "'5-LOW'"),
    # duplicate orderkey, far-future date
    (910001, 900003, "'F'", "77.0", _TS.format("2030-12-31 23:59:59"), "'2-HIGH'"),
    (None, 900001, "'O'", "10.0", _TS.format("2024-01-01 00:00:00"), "'3-MEDIUM'"),
    # exact orderdate tie for one customer: an under-determined
    # "first order per customer" (row_number over date alone) diverges
    # here — that IS a defect per the repo's pinned-tie-break standard
    (910004, 900003, "'O'", "50.0", _TS.format("2024-03-01 00:00:00"), "'1-URGENT'"),
    (910005, 900003, "'O'", "60.0", _TS.format("2024-03-01 00:00:00"), "'1-URGENT'"),
]

EDGE_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    # zero quantity / zero price
    (910001, 1, 1, 1, "0.0", "0.0", "0.0", "0.0", "'N'", "'O'", _TS.format("2024-03-01 00:00:00")),
    # NULL part/supp keys, 100% discount, NULL shipdate
    (910001, None, None, 2, "5.0", "100.0", "1.0", "0.08", "'R'", "'F'", None),
    # negative quantity and price, NULL flags, epoch shipdate
    (910002, 1, 1, 1, "-3.0", "-50.0", "0.05", "0.0", None, None, _TS.format("1970-01-01 00:00:00")),
    # duplicate (orderkey, linenumber) with line 2 above
    (910001, 2, 2, 2, "7.0", "70.0", "0.0", "0.0", "'A'", "'F'", _TS.format("2024-04-01 00:00:00")),
    (None, 1, 1, 1, "2.0", "20.0", "0.1", "0.05", "'N'", "'O'", _TS.format("2024-05-01 00:00:00")),
    # dangling orderkey (no order 919999)
    (919999, 3, 3, 1, "4.0", "40.0", "0.0", "0.0", "'N'", "'O'", _TS.format("2024-06-01 00:00:00")),
    # traverses the duplicated edge part + edge supplier
    (910003, 930001, 920001, 1, "8.0", "80.0", "0.02", "0.01", "'N'", "'O'", _TS.format("2024-07-01 00:00:00")),
]

EDGE_SUPPLIER = [
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (920001, "'Édge Supplier'", 990, "0.0"),
    (920002, None, None, "-10.0"),
    (None, "'null-key supplier'", 1, "5.0"),
]

EDGE_PART = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (930001, "'edge part ünïcôde'", "'Brand#99'", None, 0, "0.0"),
    (930002, None, None, "'ECONOMY ANODIZED STEEL'", None, None),
    (None, "'null-key part'", "'Brand#01'", "'STANDARD POLISHED TIN'", 5, "100.0"),
    # duplicate primary key
    (930001, "'edge part DUP'", "'Brand#98'", "'SMALL PLATED COPPER'", 10, "50.0"),
]

_AUGMENTED = {
    "region": (EDGE_REGION, "t(r_regionkey, r_name)"),
    "nation": (EDGE_NATION, "t(n_nationkey, n_name, n_regionkey)"),
    "customer": (EDGE_CUSTOMER, "t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)"),
    "supplier": (EDGE_SUPPLIER, "t(s_suppkey, s_name, s_nationkey, s_acctbal)"),
    "part": (EDGE_PART, "t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)"),
    "orders": (EDGE_ORDERS, "t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)"),
    "lineitem": (
        EDGE_LINEITEM,
        "t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)",
    ),
}


def _values_sql(rows: list[tuple]) -> str:
    """Rows are pre-encoded SQL fragments (quoted strings / typed literals /
    ints / None) — emit a VALUES list."""
    return ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in row) + ")"
        for row in rows
    )


@pytest.fixture(scope="module")
def rel_edge_dir(sf_dir, tmp_path_factory):
    """sf0.001 with ALL SEVEN relational tables augmented by their edge
    rows; documents/events/embeddings copied verbatim so multi-table
    plans still resolve.  Single-FILE parquet via DuckDB COPY — both
    engines read the same path, like the generated fixtures.  Column
    types are cast to the source parquet schema so the VALUES literals
    cannot silently widen a column (BIGINT keys stay BIGINT)."""
    import duckdb

    out = tmp_path_factory.mktemp("rel_edge_sf")
    con = duckdb.connect()
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if not src.exists():
            continue
        if t in _AUGMENTED:
            rows, alias = _AUGMENTED[t]
            cols = [
                r[0]
                for r in con.execute(
                    f"describe select * from read_parquet('{src}')"
                ).fetchall()
            ]
            col_list = ", ".join(cols)
            con.execute(
                f"""
                COPY (
                  SELECT * FROM (
                    SELECT {col_list} FROM read_parquet('{src}')
                    UNION ALL BY NAME
                    SELECT {col_list} FROM (VALUES {_values_sql(rows)}) {alias}
                  )
                ) TO '{out / (t + ".parquet")}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copy(src, out / f"{t}.parquet")
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def rel_edge_con(rel_edge_dir):
    con = duckdb_connection(rel_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _relational_queries())
def test_relational_query_matches_oracle_on_edge_corpus(
    spark, rel_edge_dir, rel_edge_con, name
):
    result = compare(
        QUERIES[name](spark, rel_edge_dir), rel_edge_con, ORACLE_SQL[name]
    )
    assert result["count_match"], (name, result)
    assert result["schema_match"], (name, result)
    assert result["value_match"], {
        k: v for k, v in result.items() if k != "first_diffs"
    } | {"first_diffs": result.get("first_diffs")}
