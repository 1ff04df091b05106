"""The flagship pipeline (north rule, SURVEY.md §3.5):

    read_parquet(transcripts)
      → contract gate (validate/coerce; malformed turns → quarantine)
      → ONE hash exchange on conv_id (bucket groupby)
      → per-bucket sorted vectorized features
          (sessionize, lag/lead, fills, strict-< as-of vs tool state)
      → write features + quarantine + per-partition lineage metrics

Streaming end-to-end: no full materialization; quarantine is split off in
the same single validation pass by writing the tagged dataset partitioned
on validity (hive partition `_ok=true|false`), which doubles as the
stage-1 checkpoint for resume.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..contracts import BatchValidator
from ..contracts.validator import ERRORS_COL, drop_quarantine, only_quarantine
from ..sources.transcripts import transcript_contract
from ..stages.conversations import per_conversation
from ..stages.features import GAP_US_DEFAULT, conversation_features

FEATURE_COLUMNS = [
    'conv_id', 'turn_idx', 'role', 'text', 'tool', 'ts', 'text_len',
    'time_since_prev_s', 'is_new_session', 'session_id', 'pos_in_session',
    'prev_role', 'next_role', 'prev_text_len', 'tool_ffill', 'last_tool',
    'last_tool_ts', 'time_since_tool_s',
]


def validated_dataset(ds, contract=None, batch_size: int = 131072):
    """(ok_ds, quarantine_ds) — both lazily derived from one tagged stage.

    NOTE: consuming both branches recomputes validation (Ray Data streams,
    it does not fork); `run_flagship` instead checkpoints the tagged stage
    to parquet for a strict single pass.
    """
    contract = contract or transcript_contract()
    v = BatchValidator(contract)
    tagged = ds.map_batches(v.tag, batch_format='pyarrow',
                            batch_size=batch_size, zero_copy_batch=True)
    ok = tagged.map_batches(drop_quarantine, batch_format='pyarrow',
                            zero_copy_batch=True)
    quarantine = tagged.map_batches(only_quarantine, batch_format='pyarrow',
                                    zero_copy_batch=True)
    return ok, quarantine


def feature_dataset(ok_ds, num_buckets: int = 32,
                    gap_us: int = GAP_US_DEFAULT):
    """validated transcripts → per-turn feature vectors (one shuffle)."""
    return per_conversation(
        ok_ds,
        lambda tbl, starts: conversation_features(tbl, starts, gap_us),
        num_buckets=num_buckets)


def flagship(ds, num_buckets: int = 32, gap_us: int = GAP_US_DEFAULT,
             batch_size: int = 131072):
    """In-memory two-branch variant for smoke/tests/entry():
    returns (features_ds, quarantine_ds)."""
    ok, quarantine = validated_dataset(ds, batch_size=batch_size)
    return feature_dataset(ok, num_buckets, gap_us), quarantine


def run_flagship(input_path: str, out_dir: str, num_buckets: int = 32,
                 gap_us: int = GAP_US_DEFAULT, batch_size: int = 131072,
                 resume: bool = True,
                 max_group_rows: int | None = None) -> dict:
    """Production path: single validation pass via a checkpointed tagged
    stage, partition-addressed outputs, per-partition lineage metrics,
    resumable (skips completed stages via _SUCCESS markers).

    Layout:
        out_dir/validated/_ok=true|false/...   (stage 1 checkpoint)
        out_dir/features/...                   (stage 2 output)
        out_dir/metrics.json                   (lineage: row/error counts)
    """
    import ray.data as rd

    validated_dir = os.path.join(out_dir, 'validated')
    features_dir = os.path.join(out_dir, 'features')
    metrics_path = os.path.join(out_dir, 'metrics.json')
    os.makedirs(out_dir, exist_ok=True)

    def done(stage_dir):
        return os.path.exists(os.path.join(stage_dir, '_SUCCESS'))

    # fully-resumed job: everything (incl. metrics) already on disk
    if resume and done(validated_dir) and done(features_dir) \
            and os.path.exists(metrics_path):
        with open(metrics_path) as f:
            return json.load(f)

    def mark(stage_dir):
        with open(os.path.join(stage_dir, '_SUCCESS'), 'w') as f:
            f.write('ok')

    def write_atomic(ds_out, stage_dir, **kwargs):
        """Write to a temp dir and rename: a crash mid-write leaves no
        partial part-files in the stage dir, so a resumed run can't read
        duplicated rows. Same atomic-write invariant as
        state/checkpoint.Checkpointer.write_stage (the two completion
        protocols — _SUCCESS markers here, manifest.json there — are
        documented in state/checkpoint.py; keep the write sequence in
        sync)."""
        import shutil
        tmp = stage_dir + '.__tmp__'
        shutil.rmtree(tmp, ignore_errors=True)
        ds_out.write_parquet(tmp, **kwargs)
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.replace(tmp, stage_dir)
        mark(stage_dir)

    # -- stage 1: validate + split (one pass, partitioned on validity) ----
    if not (resume and done(validated_dir)):
        # include_paths -> per-input-shard lineage survives into the
        # checkpoint (the north rule's per-partition metrics)
        ds = rd.read_parquet(input_path, include_paths=True)
        v = BatchValidator(transcript_contract())

        def tag_with_flag(tbl: pa.Table) -> pa.Table:
            src = tbl.column('path')
            tagged = v.tag(tbl.drop_columns(['path']))
            okmask = pc.is_null(tagged.column(ERRORS_COL))
            return tagged.append_column('_ok', okmask)\
                         .append_column('_src', src)

        tagged = ds.map_batches(tag_with_flag, batch_format='pyarrow',
                                batch_size=batch_size, zero_copy_batch=True)
        write_atomic(tagged, validated_dir, partition_cols=['_ok'])

    # -- stage 2: features over the ok partition --------------------------
    ok_path = os.path.join(validated_dir, '_ok=true')
    metrics: dict = {}
    if os.path.exists(ok_path) and not (resume and done(features_dir)):
        ok_ds = rd.read_parquet(ok_path)\
            .drop_columns([ERRORS_COL, '_src'])
        if max_group_rows is not None:
            # skew-hardened path: mega conversations chunked with exact
            # boundary-state handoff (stages/salting.py)
            from ..stages.salting import flagship_features_salted
            feats = flagship_features_salted(ok_ds, max_group_rows,
                                             gap_us=gap_us,
                                             num_buckets=num_buckets)
        else:
            feats = feature_dataset(ok_ds, num_buckets, gap_us)
        write_atomic(feats, features_dir)

    # -- lineage metrics --------------------------------------------------
    q_path = os.path.join(validated_dir, '_ok=false')
    n_ok = rd.read_parquet(ok_path).count() if os.path.exists(ok_path) else 0
    n_q = rd.read_parquet(q_path).count() if os.path.exists(q_path) else 0
    code_counts: dict[str, int] = {}
    if n_q:
        qd = rd.read_parquet(q_path, columns=[ERRORS_COL])

        def count_codes(tbl: pa.Table) -> pa.Table:
            local: dict[str, int] = {}
            for payload in tbl.column(ERRORS_COL).to_pylist():
                if not payload:
                    continue
                for field, err in json.loads(payload).items():
                    c = err.get('code') or 'unknown'
                    local[c] = local.get(c, 0) + 1
            return pa.table({'code': list(local), 'n': list(local.values())})

        agg = qd.map_batches(count_codes, batch_format='pyarrow')\
            .groupby('code').sum('n')
        for row in agg.take_all():
            code_counts[row['code']] = int(row['sum(n)'])
    # per-input-shard lineage (the north rule's per-partition metrics)
    per_file: dict[str, dict] = {}
    for part, field in ((ok_path, 'rows_ok'), (q_path, 'rows_quarantined')):
        if not os.path.exists(part):
            continue
        counts = rd.read_parquet(part, columns=['_src'])\
            .groupby('_src').count().take_all()
        for row in counts:
            src = os.path.basename(row['_src'])
            per_file.setdefault(src, {'rows_ok': 0,
                                      'rows_quarantined': 0})[field] = \
                int(row['count()'])
    metrics = {'rows_ok': n_ok, 'rows_quarantined': n_q,
               'error_codes': code_counts, 'per_file': per_file}
    with open(metrics_path, 'w') as f:
        json.dump(metrics, f, indent=1, sort_keys=True)
    return metrics


def run_incremental(input_dir: str, out_dir: str, **flagship_kwargs
                    ) -> dict:
    """File-level incremental processing: run the flagship pipeline
    over ONLY the parquet files that appeared in ``input_dir`` since
    the last run. The data-lake shape: input files are immutable
    append-only shards; every invocation batches all UNSEEN files into
    ONE flagship run (one pipeline execution per increment, not per
    file) written under ``out_dir/batches/<batch-name>/`` with the full
    run_flagship layout (validated/ features/ metrics.json incl. the
    per-input-file lineage), and records them in an atomically-replaced
    ``ingest_manifest.json``. A file whose size changed since it was
    ingested raises — silent reprocessing would duplicate its rows
    across batches for consumers reading all feature dirs
    (``incremental_features`` below).

    Returns {'n_new', 'n_skipped', 'batch', 'metrics'} — metrics is the
    new batch's run_flagship metrics ({} when nothing was pending)."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, 'ingest_manifest.json')
    manifest = {'files': {}, 'batches': {}}
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)

    files = sorted(f for f in os.listdir(input_dir)
                   if f.endswith('.parquet'))
    pending = []
    for name in files:
        full = os.path.join(input_dir, name)
        size = os.path.getsize(full)
        rec = manifest['files'].get(name)
        if rec is None:
            pending.append((name, full, size))
        elif rec['size'] != size:
            raise ValueError(
                f'run_incremental: ingested file {name!r} changed size '
                f'({rec["size"]} -> {size}); input shards must be '
                'immutable — write changes as NEW files')
    if not pending:
        return {'n_new': 0, 'n_skipped': len(files), 'batch': None,
                'metrics': {}}

    digest = hashlib.sha1(
        '\n'.join(n for n, _, _ in pending).encode()).hexdigest()[:8]
    batch_name = f'batch-{len(manifest["batches"]):05d}-{digest}'
    batch_dir = os.path.join(out_dir, 'batches', batch_name)
    metrics = run_flagship([full for _, full, _ in pending], batch_dir,
                           **flagship_kwargs)

    for name, _full, size in pending:
        manifest['files'][name] = {'size': size, 'batch': batch_name}
    manifest['batches'][batch_name] = {
        'completed_at': time.strftime('%Y-%m-%dT%H:%M:%S'),
        'n_files': len(pending),
        'rows_ok': metrics.get('rows_ok', 0),
        'rows_quarantined': metrics.get('rows_quarantined', 0),
    }
    tmp = man_path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, man_path)
    return {'n_new': len(pending), 'n_skipped': len(files) - len(pending),
            'batch': batch_name, 'metrics': metrics}


def incremental_features(out_dir: str):
    """Dataset over every ingested batch's features — the consumer view
    of an incrementally-built output (one read over N batch dirs)."""
    import ray.data as rd
    man_path = os.path.join(out_dir, 'ingest_manifest.json')
    with open(man_path) as f:
        manifest = json.load(f)
    dirs = [os.path.join(out_dir, 'batches', b, 'features')
            for b in sorted(manifest['batches'])]
    # read_parquet expands a single directory but not a LIST of
    # directories — hand it the part files
    files = [os.path.join(d, f) for d in dirs if os.path.exists(d)
             for f in sorted(os.listdir(d)) if f.endswith('.parquet')]
    if not files:
        raise FileNotFoundError('no completed batches under ' + out_dir)
    return rd.read_parquet(files)
