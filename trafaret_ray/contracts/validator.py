"""BatchValidator: run a Dict contract over a pyarrow Table, splitting each
batch into (ok, quarantine).

This is the engine's data-plane gate (SURVEY.md §2.9): every stage
validates/coerces rows through the declarative contract before emission;
malformed rows are rejected into a quarantine dataset carrying a
structure-mirroring ``errors`` payload (the vectorized analogue of the
reference's DataError tree — trafaret/dataerror.py:41-63) plus per-batch
error-code counters for lineage metrics.

Designed for ``ds.map_batches(validator.tag, batch_format='pyarrow',
zero_copy_batch=True)``: one pass per batch, Arrow kernels only; the sparse
python work (building error payloads) touches failed rows only.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .record import Dict, ColumnsResult
from .result import as_array

ERRORS_COL = '_errors'


def _error_json(errs) -> str:
    """Serialize one row's {field: FieldError} map as to_struct-shaped JSON."""
    return json.dumps({k: e.to_struct() for k, e in errs.items()},
                      sort_keys=True, default=str)


class BatchValidator:
    """Compile once (e.g. in an actor's ``__init__``), call per batch."""

    def __init__(self, contract: Dict):
        assert isinstance(contract, Dict), 'BatchValidator wraps a Dict contract'
        self.contract = contract

    def apply_table(self, table: pa.Table) -> tuple[ColumnsResult, int]:
        n = table.num_rows
        cols = {name: as_array(table.column(i))
                for i, name in enumerate(table.column_names)}
        return self.contract.apply_columns(cols, n), n

    def split(self, table: pa.Table) -> tuple[pa.Table, pa.Table]:
        """-> (ok_table with coerced columns, quarantine_table with the
        ORIGINAL columns + an ``_errors`` JSON column)."""
        cres, n = self.apply_table(table)
        ok_mask = pa.array(cres.ok)
        out = pa.table(cres.out_cols)
        ok_table = out.filter(ok_mask)
        bad_idx = np.nonzero(~cres.ok)[0]
        if len(bad_idx) == 0:
            quarantine = table.slice(0, 0).append_column(
                ERRORS_COL, pa.array([], type=pa.string()))
        else:
            bad = table.take(pa.array(bad_idx, type=pa.int64()))
            payload = pa.array([_error_json(cres.row_errors[int(i)])
                                for i in bad_idx], type=pa.string())
            quarantine = bad.append_column(ERRORS_COL, payload)
        return ok_table, quarantine

    def tag(self, table: pa.Table) -> pa.Table:
        """Single-output form for ``map_batches``: coerced columns plus an
        ``_errors`` column that is null for valid rows. Split downstream with
        ``drop_quarantine`` / ``only_quarantine``, or write in one pass
        partitioned by validity."""
        cres, n = self.apply_table(table)
        payload = np.full(n, None, dtype=object)
        for i, errs in cres.row_errors.items():
            payload[i] = _error_json(errs)
        out_cols = dict(cres.out_cols)
        # quarantined rows keep their original (uncoerced) values so the
        # quarantine dataset preserves the offending input
        ok_arr = pa.array(cres.ok)
        import pyarrow.compute as pc
        for name in out_cols:
            if name in table.column_names:
                orig = as_array(table.column(name))
                coerced = out_cols[name]
                if orig.type != coerced.type:
                    try:
                        orig = orig.cast(coerced.type)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                            pa.ArrowTypeError):
                        orig = None
                if orig is not None:
                    out_cols[name] = pc.if_else(ok_arr, coerced, orig)
        out_cols[ERRORS_COL] = pa.array(payload, type=pa.string())
        return pa.table(out_cols)

    def error_code_counts(self, table: pa.Table) -> dict[str, int]:
        """Per-batch lineage metric: error-code histogram."""
        cres, _ = self.apply_table(table)
        counts: dict[str, int] = {}
        for errs in cres.row_errors.values():
            for e in errs.values():
                c = e.code or 'unknown'
                counts[c] = counts.get(c, 0) + 1
        return counts


def drop_quarantine(table: pa.Table) -> pa.Table:
    """Keep valid rows; drop the _errors column."""
    import pyarrow.compute as pc
    mask = pc.is_null(table.column(ERRORS_COL))
    return table.filter(mask).drop_columns([ERRORS_COL])


def only_quarantine(table: pa.Table) -> pa.Table:
    """Keep quarantined rows (``_errors`` retained)."""
    import pyarrow.compute as pc
    mask = pc.is_valid(table.column(ERRORS_COL))
    return table.filter(mask)


def validate_split(ds, contract: Dict, batch_size: int = 65536):
    """Dataset-level two-branch split.

    Both branches share the tagged upstream; consuming both executes the
    validation twice (Ray Data streams, it does not fork). For a single-pass
    production run, use ``tag`` + a partitioned write instead
    (pipelines/flagship.py).
    """
    validator = BatchValidator(contract)
    tagged = ds.map_batches(validator.tag, batch_format='pyarrow',
                            batch_size=batch_size, zero_copy_batch=True)
    ok = tagged.map_batches(drop_quarantine, batch_format='pyarrow',
                            zero_copy_batch=True)
    quarantine = tagged.map_batches(only_quarantine, batch_format='pyarrow',
                                    zero_copy_batch=True)
    return ok, quarantine
