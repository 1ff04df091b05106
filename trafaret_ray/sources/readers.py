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


def read_parquet_evolved(paths, columns=None, filter=None,
                         schema: pa.Schema | None = None, **kwargs):
    """Schema-evolution-tolerant parquet read. Shards of a long-lived
    corpus are written at different pipeline epochs: later shards add
    columns, earlier ones carry narrower numeric types. A plain read
    over such a directory either fails to unify or silently drops the
    evolution. This reader unifies all fragment schemas BY NAME with
    permissive type promotion (int32+int64 -> int64, int+float ->
    float), then reads with the unified schema so missing columns
    surface as typed nulls — the source-level analogue of the contract
    algebra's optional ``Key`` defaults.

    Scale: the unification scan touches only parquet FOOTERS (KBs per
    file, no data pages). At millions of shards pass an explicit
    ``schema=`` (e.g. from the newest epoch's metadata) to skip the
    scan entirely. ``columns=`` pruning applies after unification, so
    a column that exists only in new shards can still be projected.
    """
    import pyarrow.dataset as pads
    import ray.data as rd
    if schema is None:
        frags = pads.dataset(paths, format='parquet').get_fragments()
        schema = pa.unify_schemas([f.physical_schema for f in frags],
                                  promote_options='permissive')
    # Projection rides the schema: a narrowed explicit schema both
    # projects and prunes at the scanner. Ray 2.49 rejects schema= and
    # columns= together (the fragment reader projects but then
    # re-asserts the full schema), so columns= is never passed through.
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    if filter is not None:
        kwargs['filter'] = filter
    return rd.read_parquet(paths, schema=schema, **kwargs)


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
              'csv': read_csv, 'orc': read_orc,
              'feather': read_feather,
              'parquet_evolved': read_parquet_evolved}[format]
    ds = reader(paths, columns=columns, **kwargs)
    v = BatchValidator(contract)
    return ds.map_batches(v.tag, batch_format='pyarrow',
                          batch_size=batch_size, zero_copy_batch=True)


def read_orc(paths, columns=None, **kwargs):
    """ORC ingest (pyarrow.orc has no native Ray reader): the file list
    streams through ``read_binary_files`` and each task decodes its
    file to Arrow, pruning to ``columns`` at decode (ORC reads only the
    requested columns' streams). Parallelism = file count — split
    multi-GB single files upstream; parquet stays the first-class
    format."""
    import io

    import pyarrow.orc as porc
    import ray.data as rd

    blobs = rd.read_binary_files(paths, include_paths=False, **kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        tabs = [porc.ORCFile(io.BytesIO(b.as_py())).read(columns=columns)
                for b in batch.column('bytes')]
        return pa.concat_tables(tabs)

    return blobs.map_batches(decode, batch_format='pyarrow',
                             batch_size=1)


def read_feather(paths, columns=None, **kwargs):
    """Arrow IPC / Feather-v2 ingest — same per-file decode shape as
    ``read_orc`` (no native Ray reader): file blobs stream through
    ``read_binary_files``; each task materializes its file's record
    batches zero-copy from the buffer and prunes to ``columns``."""
    import pyarrow.ipc as ipc
    import ray.data as rd

    blobs = rd.read_binary_files(paths, include_paths=False, **kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        tabs = []
        for b in batch.column('bytes'):
            t = ipc.open_file(pa.BufferReader(b.as_py())).read_all()
            if columns is not None:
                t = t.select(columns)
            tabs.append(t)
        return pa.concat_tables(tabs)

    return blobs.map_batches(decode, batch_format='pyarrow',
                             batch_size=1)
