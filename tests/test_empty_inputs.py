"""Every query must RUN on 0-row inputs.

At 100 TB an empty shard, a filter that matches nothing, or a
date-partition with no data is routine — a pipeline that crashes on it
takes the whole job down. The classic hazards this sweeps for:

  * an all-empty Dataset loses its schema, so a driver-side
    ``to_pandas()['col']`` on a small side raises KeyError
    (CLAUDE.md invariant; fixed via ``queries._small_df`` and typed
    empty short-circuits),
  * ``.schema()`` on a fully-empty DERIVED dataset returns None,
  * ``take_batch(1)`` / ``to_pylist()[0]`` / ``concat_tables([])`` /
    ``reshape(0, -1)`` on empty collections.

The fixture is the sf0.001 driver testdata sliced to zero rows — the
real schemas, no data. Correct VALUES on real data are the oracle
gate's job (tools/check_queries.py); this suite only asserts every
query completes and yields a consumable (possibly 0-row) result.
"""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope='module')
def empty_sf_dir(tmp_path_factory):
    src = '/root/testdata/sf0.001'
    out = tmp_path_factory.mktemp('sf_empty')
    import os
    for f in os.listdir(src):
        if f.endswith('.parquet'):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.slice(0, 0), str(out / f))
    return str(out)


def _all_queries():
    import __ray_entry__ as entry
    return sorted(entry.queries().items())


@pytest.mark.parametrize('name,fn', _all_queries(),
                         ids=[n for n, _ in _all_queries()])
def test_query_runs_on_empty_input(ray_session, empty_sf_dir, name, fn):
    import ray.data as rd
    out = fn(empty_sf_dir)
    n = out.count() if isinstance(out, rd.Dataset) else len(out)
    assert n >= 0
