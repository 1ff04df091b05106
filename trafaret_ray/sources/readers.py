"""Source readers: every ingest format behind the same contract gate.

Thin, explicit wrappers over the Ray Data readers with the engine's two
house rules applied at the source:

  * **Prune at the read** — parquet gets ``columns=`` + optional pyarrow
    dataset filter expressions (row-group pushdown); other formats project
    right after decode.
  * **Gate at the source** — ``read_validated`` attaches the contract
    gate so malformed rows are tagged before anything downstream runs.
"""

from __future__ import annotations

import pyarrow as pa


def read_parquet(paths, columns=None, filter=None, **kwargs):
    import ray.data as rd
    if filter is not None:
        kwargs['filter'] = filter
    return rd.read_parquet(paths, columns=columns, **kwargs)


def read_json(paths, columns=None, **kwargs):
    import ray.data as rd
    ds = rd.read_json(paths, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(paths, columns=None, **kwargs):
    import ray.data as rd
    ds = rd.read_csv(paths, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_text(paths, **kwargs):
    import ray.data as rd
    return rd.read_text(paths, **kwargs)


def read_binary(paths, include_paths=True, **kwargs):
    """Opaque payload ingest (the multimodal entry point): one row per
    file, ``bytes`` column + source path."""
    import ray.data as rd
    return rd.read_binary_files(paths, include_paths=include_paths,
                                **kwargs)


def read_validated(paths, contract, format: str = 'parquet',
                   columns=None, batch_size: int = 131072, **kwargs):
    """Read + contract gate in one call: returns the TAGGED dataset
    (coerced columns + `_errors` null-for-valid). Split downstream with
    contracts.validator.drop_quarantine / only_quarantine."""
    from ..contracts import BatchValidator
    reader = {'parquet': read_parquet, 'json': read_json,
              'csv': read_csv}[format]
    ds = reader(paths, columns=columns, **kwargs)
    v = BatchValidator(contract)
    return ds.map_batches(v.tag, batch_format='pyarrow',
                          batch_size=batch_size, zero_copy_batch=True)
