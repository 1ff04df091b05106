"""Inventory invariants over the queries()/oracle_sql() registries.

The driver's correctness gate is only as strong as its coverage: every
query must either carry a DuckDB oracle or appear on the EXPLICIT
rows-only list below (approximate / heuristic / binary-codec ops with no
SQL equivalent — the same list CLAUDE.md and the round docs cite). A new
query silently missing its oracle would otherwise downgrade to the weak
rows-only check without anyone deciding that.
"""
import __ray_entry__ as entry

# every entry here is rows-only BY DESIGN — adding to this list is a
# decision (document why in the query docstring), not a default.
# EMPTY as of r5: every query, the binary-codec ones included, carries
# a byte-parity DuckDB oracle (the codec oracles decode hex(payload)
# in SQL and mirror each defined IEEE rounding).
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_declared_rows_only():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    unexplained = qs - oracles - ROWS_ONLY
    assert not unexplained, (
        f'queries without an oracle and not declared rows-only: '
        f'{sorted(unexplained)}')


def test_rows_only_list_is_not_stale():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    # an entry that gained an oracle (or was removed) must leave the list
    stale = (ROWS_ONLY - qs) | (ROWS_ONLY & oracles)
    assert not stale, f'stale rows-only declarations: {sorted(stale)}'


def test_every_oracle_has_a_query():
    orphans = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphans, f'oracle_sql entries without a query: {orphans}'


def test_every_oracle_compiles_on_empty_views():
    """EXPLAIN-compile every ORACLE_SQL string against 0-row views of
    the real table schemas — a fast syntax/binder gate (the r4
    pointer-jump edit shipped an ambiguous USING that only the slow
    full gate would have caught). Planning a 0-row input also smokes
    the generated unrolled-CTE chains without executing them."""
    import glob

    import duckdb
    import pyarrow.parquet as pq
    import pytest

    paths = sorted(glob.glob('/root/testdata/sf0.001/*.parquet'))
    if not paths:
        # without the driver fixture no views register and every oracle
        # would fail binder resolution — skip rather than mass-fail
        pytest.skip('driver testdata not present')
    con = duckdb.connect()
    for p in paths:
        name = p.split('/')[-1].split('.')[0]
        con.register(f'_full_{name}', pq.read_table(p).slice(0, 0))
        con.execute(f'CREATE VIEW {name} AS SELECT * FROM _full_{name}')
    bad = {}
    for qname, sql in entry.oracle_sql().items():
        try:
            con.execute(f'EXPLAIN {sql}')
        except Exception as exc:   # noqa: BLE001 — collect all
            bad[qname] = str(exc).splitlines()[0]
    con.close()
    assert not bad, f'oracle SQL fails to compile: {bad}'
