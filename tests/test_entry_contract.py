"""Driver-contract smoke: exactly what the driver's verify does — entry()
runs with a stable schema, every queries() entry is callable, every
oracle_sql() key has a query, omissions are documented."""

from __future__ import annotations

import importlib.util

import pytest


@pytest.fixture(scope="module")
def contract():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_with_stable_schema(contract, spark):
    df = contract.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "count_order",
    ]


# Queries the driver checks rows-only (NO DuckDB oracle), each with the
# reason SQL cannot express it. Keep this list at exactly the genuinely
# non-SQL-expressible surface — the round-3 standard (every query carries a
# full oracle) holds for everything else, and additions here need the same
# scrutiny as a PLANBUILD_JOB_ALLOWLIST entry. Empty since r11: the driver
# gate does not honor a rows-only fallback (it scores `err: no_oracle`, the
# one red row of CORRECTNESS_r10), so pq_rotation_recall's eigh rotation was
# replaced by the SQL-replayable variance round-robin permutation (VERDICT
# r10 item 1(a)) and the eigh A/B moved to the --pq-rotation-eval CLI
# artifact.
ROWS_ONLY_QUERIES: dict[str, str] = {}


def test_contract_shapes(contract):
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert len(qs) >= 57
    assert set(oracles) <= set(qs)
    # round 3 standard, amended r10: every registered query has a full
    # oracle EXCEPT the documented rows-only set above
    assert set(qs) - set(oracles) == set(ROWS_ONLY_QUERIES)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_readme_query_count_matches_registry(contract):
    """README's coverage claims must track len(QUERIES) (VERDICT r4 item 4)."""
    import pathlib
    import re

    readme = pathlib.Path(__file__).resolve().parent.parent / "README.md"
    text = readme.read_text()
    n = len(contract.queries())
    claimed = {int(m) for m in re.findall(r"(?:ALL|all) (\d+) registered queries", text)}
    assert claimed == {n}, f"README claims {claimed}, registry has {n}"


def test_cert_ledger_count_matches_registry(contract):
    """VERDICT r11 item 6: the round-certification ledger and the registry
    must agree ON THE SAME TREE (the r11 cert said 182/182 while HEAD's
    registry was 183 — cert and registry landed in different commits).
    The round log's newest ``certified registry: N/M queries`` marker is
    parsed and both numbers must equal len(QUERIES); a cert commit that
    doesn't update the marker alongside a registry change fails here, in
    the same pytest run the certification itself records."""
    import pathlib
    import re

    survey = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    marks = re.findall(r"certified registry: (\d+)/(\d+) queries", survey.read_text())
    assert marks, "no 'certified registry: N/M queries' marker in SURVEY.md §8"
    n_q, n_o = (int(x) for x in marks[-1])
    n = len(contract.queries())
    assert (n_q, n_o) == (n, n), f"last cert marker {n_q}/{n_o}, registry has {n}"
