"""Training-data export sinks.

Parquet is the engine's native sink (``write_parquet`` everywhere, atomic
tmp-dir + rename in pipelines/flagship.py and state/checkpoint.py). This
module adds the interchange format the downstream tokenizer/trainer stacks
actually consume: **hash-shard-addressed JSONL**, written with the same
partition-addressed resumability contract as the north rule's checkpoint
story — one file per shard, a manifest with per-shard lineage counts, a
``_SUCCESS`` marker, and resume-by-skipping-finished-shards.

Scale shape: ONE hash exchange (stages/conversations.bucket_exchange) puts
every row of a shard into exactly one task; that task serializes its shards
vectorized (pandas ``to_json(lines=True)`` — C fast path) and renames each
file into place atomically. No driver materialization: only the per-shard
manifest rows (O(num_shards)) return to the driver. On a multi-node
cluster ``out_dir`` must be a shared filesystem / object-store mount — the
writing task, not the driver, owns each file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .stages.conversations import bucket_exchange

_MANIFEST = 'manifest.json'
_SUCCESS = '_SUCCESS'


def _shard_of(keys: np.ndarray, num_shards: int, salt: int) -> np.ndarray:
    """Knuth multiplicative hash — same family as
    functions/sampling.shard_positions, so an export layout can be
    byte-reproduced (and oracle-checked) from the key column alone."""
    h = ((keys.astype(np.int64) + salt) % np.int64(2 ** 31)) \
        * np.int64(2654435761) % np.int64(2 ** 32)
    return (h % num_shards).astype(np.int64)


def shard_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f'shard={shard:05d}.jsonl')


def export_jsonl_shards(ds, out_dir: str, key_col: str,
                        num_shards: int = 64, salt: int = 0,
                        resume: bool = False,
                        num_buckets: int | None = None) -> pd.DataFrame:
    """Export ``ds`` as ``num_shards`` JSONL files under ``out_dir``.

    * shard = multiplicative hash of ``key_col`` (int64 keys; the same
      deterministic layout family as ``shard_positions``),
    * rows inside a shard are sorted by ``key_col`` — reruns are
      byte-identical, so a resumed job and a fresh job agree,
    * each file is written to a ``.tmp`` sibling and renamed into place
      (atomic on POSIX) — a killed task never leaves a half shard,
    * ``resume=True`` skips shards whose final file already exists
      (partition-addressed resume; delete a bad shard file to redo it),
    * returns the manifest as a DataFrame (shard, rows, nbytes, path,
      skipped) and writes ``manifest.json`` + ``_SUCCESS`` under
      ``out_dir`` once every shard reported in.

    Null ``key_col`` rows cannot be assigned a shard and are rejected
    with ValueError inside the writing task — quarantine upstream (the
    contract gate's job), don't silently drop at the sink.
    """
    os.makedirs(out_dir, exist_ok=True)
    nb = num_buckets or min(num_shards, 32)

    def add_shard(tbl: pa.Table) -> pa.Table:
        col = tbl.column(key_col)
        if col.null_count:
            raise ValueError(
                f'export_jsonl_shards: null {key_col} cannot be '
                'sharded — quarantine malformed rows upstream')
        keys = col.combine_chunks().to_numpy(zero_copy_only=False)
        return tbl.append_column(
            '_shard', pa.array(_shard_of(keys, num_shards, salt)))

    _m_schema = pa.schema([('shard', pa.int64()), ('rows', pa.int64()),
                           ('nbytes', pa.int64()), ('path', pa.string()),
                           ('skipped', pa.bool_())])

    def write_bucket(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _m_schema.empty_table()
        out = []
        df = tbl.to_pandas()
        for shard, g in df.groupby('_shard', sort=True):
            final = shard_path(out_dir, int(shard))
            if resume and os.path.exists(final):
                out.append((int(shard), 0, os.path.getsize(final),
                            final, True))
                continue
            g = g.sort_values(key_col, kind='stable')\
                .drop(columns=['_shard'])
            payload = g.to_json(orient='records', lines=True,
                                force_ascii=False, date_format='iso')
            if not payload.endswith('\n'):
                payload += '\n'
            data = payload.encode('utf-8')
            tmp = final + f'.tmp.{os.getpid()}'
            with open(tmp, 'wb') as f:
                f.write(data)
            os.rename(tmp, final)
            out.append((int(shard), len(g), len(data), final, False))
        cols = list(zip(*out))
        return pa.table({f.name: pa.array(list(c), f.type)
                         for f, c in zip(_m_schema, cols)})

    manifest_ds = bucket_exchange(
        ds.map_batches(add_shard, batch_format='pyarrow',
                       zero_copy_batch=True),
        '_shard', write_bucket, num_buckets=nb)
    # O(num_shards) rows — the only thing the driver touches
    mdf = manifest_ds.to_pandas()
    if len(mdf) == 0:
        mdf = _m_schema.empty_table().to_pandas()
    mdf = mdf.sort_values('shard').reset_index(drop=True)
    with open(os.path.join(out_dir, _MANIFEST), 'w') as f:
        json.dump({'num_shards': num_shards, 'salt': salt,
                   'key_col': key_col,
                   'shards': mdf.to_dict(orient='records')}, f, indent=1)
    with open(os.path.join(out_dir, _SUCCESS), 'w') as f:
        f.write('')
    return mdf


def _write_file_per_block(ds, out_dir: str, ext: str, write_fn):
    """Shared one-file-per-block sink protocol: CONTENT-ADDRESSED file
    names (sha1 of the block's IPC bytes) make task retries idempotent
    (a retry rewrites the same path via tmp+rename), and the manifest
    Dataset is MATERIALIZED before returning so consuming it twice
    cannot re-execute the writes (lazy side-effecting sinks double
    their output). Two identical-content blocks coalesce into one file
    and two manifest rows naming it — by-construction dedup of exact
    duplicate blocks, noted here because it is observable.

    The run's file set is defined by the MANIFEST (persisted as
    ``manifest.json`` + ``_SUCCESS`` in ``out_dir``, and returned as a
    Dataset), NOT by a directory listing: content-addressed parts from
    a previous run over different data are left in place (they are
    some prior manifest's files), so a consumer must read the manifest
    — or point each run at a fresh out_dir."""
    import hashlib
    import io

    import pyarrow.ipc as ipc

    os.makedirs(out_dir, exist_ok=True)
    m_schema = pa.schema([('path', pa.string()), ('rows', pa.int64()),
                          ('bytes', pa.int64())])

    def write_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return m_schema.empty_table()
        sink = io.BytesIO()
        with ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        digest = hashlib.sha1(sink.getvalue()).hexdigest()[:16]
        final = os.path.join(out_dir, f'part-{digest}{ext}')
        if not os.path.exists(final):
            tmp = final + f'.tmp.{os.getpid()}'
            write_fn(tbl, tmp)
            os.rename(tmp, final)
        return pa.table({'path': pa.array([final], pa.string()),
                         'rows': pa.array([tbl.num_rows], pa.int64()),
                         'bytes': pa.array([os.path.getsize(final)],
                                           pa.int64())}, schema=m_schema)

    manifest = ds.map_batches(write_block, batch_format='pyarrow',
                              batch_size=None).materialize()
    mdf = manifest.to_pandas()
    if len(mdf) == 0:
        mdf = m_schema.empty_table().to_pandas()
    mdf = mdf.sort_values('path').reset_index(drop=True)
    with open(os.path.join(out_dir, _MANIFEST), 'w') as f:
        json.dump({'format': ext.lstrip('.'),
                   'files': mdf.to_dict(orient='records')}, f, indent=1)
    with open(os.path.join(out_dir, _SUCCESS), 'w') as f:
        f.write('')
    return manifest


def write_orc(ds, out_dir: str):
    """ORC sink: one file per input block, written task-side in
    parallel. Content-addressed names + eager manifest (see
    _write_file_per_block). Returns the manifest Dataset of
    (path, rows, bytes)."""
    import pyarrow.orc as porc
    return _write_file_per_block(ds, out_dir, '.orc', porc.write_table)


def write_feather(ds, out_dir: str):
    """Arrow IPC (Feather v2) sink — same protocol as write_orc."""
    import pyarrow.feather as pf
    return _write_file_per_block(ds, out_dir, '.feather',
                                 pf.write_feather)
