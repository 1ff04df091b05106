"""Two-phase (partial/final) aggregation.

A bare ``groupby(key).aggregate(...)`` shuffles every row; at 100 TB that
is the dominant cost for low-cardinality keys. ``pre_aggregate`` combines
inside each ``map_batches`` first (one partial row per key per batch —
vectorized pandas groupby), so the exchange moves only partials, then a
small Ray ``groupby`` finalizes. Supported aggs compose from mergeable
partials: sum, count, min, max; mean is finalized as sum/count.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_MERGE = {'sum': 'sum', 'count': 'sum', 'min': 'min', 'max': 'max'}


def pre_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                  batch_format: str = 'pyarrow'):
    """aggs: {out_name: (col, fn)} with fn in sum|count|min|max|mean.

    Returns a Ray Dataset of one row per key combination with the named
    output columns. ``count`` counts non-null values of ``col`` (use any
    non-null column for row counts). ``mean`` adds hidden sum/count
    partials and divides at the end.
    """
    plan = {}      # partial col -> (src col, partial fn)
    finals = {}    # out name -> expression over partial cols
    for out, (col, fn) in aggs.items():
        if fn == 'mean':
            plan[f'__s_{out}'] = (col, 'sum')
            plan[f'__c_{out}'] = (col, 'count')
            finals[out] = ('div', f'__s_{out}', f'__c_{out}')
        else:
            plan[out] = (col, fn)
            finals[out] = ('id', out, None)

    def partial(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        pieces = {}
        for pcol, (col, fn) in plan.items():
            pieces[pcol] = getattr(g[col], fn)()
        out = pd.DataFrame(pieces).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format='pyarrow',
                              zero_copy_batch=True)

    from ray.data.aggregate import Max, Min, Sum
    agg_objs = []
    for pcol, (col, fn) in plan.items():
        cls = {'sum': Sum, 'count': Sum, 'min': Min, 'max': Max}[_MERGE[fn]]
        agg_objs.append(cls(pcol, alias_name=pcol))
    merged = partials.groupby(keys).aggregate(*agg_objs)

    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {k: tbl.column(k) for k in keys}
        for out, (kind, a, b) in finals.items():
            if kind == 'div':
                cols[out] = pc.divide(
                    pc.cast(tbl.column(a), pa.float64()),
                    pc.cast(tbl.column(b), pa.float64()))
            else:
                cols[out] = tbl.column(a)
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format='pyarrow')
